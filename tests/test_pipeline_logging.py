"""Structured-logging contract tests, in the reference's dedicated
``test_*_logging.py`` style (e.g.
tests/test_check_stac_metadata_utils_logging.py): each pipeline stage
emits exactly the documented event constant with machine-readable
fields — traversal, per-check validation failures (checksum mismatch,
classification gate), validation summary, import jobs, run completion.
"""

from __future__ import annotations

import logging

import pytest
from pyspark.sql import functions as F

from geostore_spark.logging_keys import (
    LOGGER_NAME,
    LOG_MESSAGE_IMPORT_JOB_RESULT,
    LOG_MESSAGE_PIPELINE_RUN_COMPLETE,
    LOG_MESSAGE_TRAVERSAL_COMPLETE,
    LOG_MESSAGE_VALIDATION_CHECK_FAILURE,
    LOG_MESSAGE_VALIDATION_COMPLETE,
)
from geostore_spark.pipeline.ingest import create_dataset_version
from geostore_spark.sources.store import MetadataStore

from .stac_fixtures import build_golden_tree, minimal_collection, _write_json
from .test_pipeline import NOW, _rng, _setup_dataset


@pytest.fixture()
def store(spark, tmp_path):
    return MetadataStore(spark, str(tmp_path / "store"))


def _events(caplog, message):
    return [
        r.event
        for r in caplog.records
        if r.name == LOGGER_NAME and r.message == message
    ]


@pytest.fixture()
def logcap(caplog):
    caplog.set_level(logging.INFO, logger=LOGGER_NAME)
    return caplog


def _run(spark, store, tmp_path, root_url):
    return create_dataset_version(
        spark,
        store,
        _setup_dataset(store),
        root_url,
        str(tmp_path / "storage"),
        now=NOW,
        rng=_rng(),
    )


def test_traversal_emits_one_complete_event(spark, store, tmp_path, logcap):
    tree = build_golden_tree(str(tmp_path))
    _run(spark, store, tmp_path, tree["root_url"])
    [ev] = _events(logcap, LOG_MESSAGE_TRAVERSAL_COMPLETE)
    assert ev["root_url"] == tree["root_url"]
    assert ev["n_urls"] == 3  # catalog → collection → item, revisit deduped
    assert ev["n_rounds"] == 3


def test_checksum_mismatch_emits_check_failure_event(spark, store, tmp_path, logcap):
    import json

    tree = build_golden_tree(str(tmp_path))
    with open(tree["item"]) as f:
        item = json.load(f)
    item["assets"]["asset0"]["file:checksum"] = "1220" + "0" * 64
    _write_json(tree["item"], item)
    _run(spark, store, tmp_path, tree["root_url"])

    failures = _events(logcap, LOG_MESSAGE_VALIDATION_CHECK_FAILURE)
    checksum = [e for e in failures if e["check"] == "checksum"]
    assert len(checksum) == 1
    assert checksum[0]["url"].endswith("data1.bin")
    assert "message" in checksum[0]["details"]
    [summary] = _events(logcap, LOG_MESSAGE_VALIDATION_COMPLETE)
    assert summary["success"] is False
    # failed run → no import job events
    assert _events(logcap, LOG_MESSAGE_IMPORT_JOB_RESULT) == []


def test_classification_gate_emits_check_failure_event(spark, store, tmp_path, logcap):
    root = _write_json(
        str(tmp_path / "staging" / "collection.json"),
        minimal_collection(links=[], **{"linz:security_classification": "restricted"}),
    )
    _run(spark, store, tmp_path, root)
    failures = _events(logcap, LOG_MESSAGE_VALIDATION_CHECK_FAILURE)
    gate = [e for e in failures if e["check"] == "security classification"]
    assert len(gate) == 1
    assert "restricted" in gate[0]["details"]["message"]


def test_successful_run_emits_import_and_run_events(spark, store, tmp_path, logcap):
    tree = build_golden_tree(str(tmp_path))
    resp = _run(spark, store, tmp_path, tree["root_url"])
    [summary] = _events(logcap, LOG_MESSAGE_VALIDATION_COMPLETE)
    assert summary["success"] is True and summary["n_failed_sample"] == 0
    jobs = _events(logcap, LOG_MESSAGE_IMPORT_JOB_RESULT)
    assert {(e["job"], e["status"]) for e in jobs} == {
        ("asset", "Complete"),
        ("metadata", "Complete"),
    }
    [run] = _events(logcap, LOG_MESSAGE_PIPELINE_RUN_COMPLETE)
    assert run["execution_id"] == resp["body"]["execution_id"]
    assert run["validation_success"] is True
