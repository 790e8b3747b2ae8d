"""Per-check-family logging contract, mirroring the reference's
dedicated checksum logging suite
(/root/reference/tests/test_check_files_checksums_logging.py and
test_check_stac_metadata_utils_logging.py): each ingest emits one
"Check Stage Complete" event per check family — checksum, JSON schema,
security classification, ... — carrying machine-readable pass/fail
counts, so operators alert on a family's failure count without parsing
per-URL rows."""

from __future__ import annotations

import json
import logging

import pytest

from geostore_spark.logging_keys import (
    LOGGER_NAME,
    LOG_MESSAGE_CHECK_STAGE_COMPLETE,
)
from geostore_spark.pipeline import validation as V
from geostore_spark.sources.store import MetadataStore

from .stac_fixtures import build_golden_tree, _write_json
from .test_pipeline import NOW, _rng, _setup_dataset
from geostore_spark.pipeline.ingest import create_dataset_version


@pytest.fixture()
def store(spark, tmp_path):
    return MetadataStore(spark, str(tmp_path / "store"))


@pytest.fixture()
def logcap(caplog):
    caplog.set_level(logging.INFO, logger=LOGGER_NAME)
    return caplog


def _stage_events(caplog):
    return {
        r.event["check"]: r.event
        for r in caplog.records
        if r.name == LOGGER_NAME and r.message == LOG_MESSAGE_CHECK_STAGE_COMPLETE
    }


def _ingest(spark, store, tmp_path, root_url):
    return create_dataset_version(
        spark,
        store,
        _setup_dataset(store),
        root_url,
        str(tmp_path / "storage"),
        now=NOW,
        rng=_rng(),
    )


def test_clean_ingest_emits_per_family_rollup(spark, store, tmp_path, logcap):
    tree = build_golden_tree(str(tmp_path))
    _ingest(spark, store, tmp_path, tree["root_url"])
    events = _stage_events(logcap)
    # checksum and schema families both roll up, all passing
    assert V.CHECK_CHECKSUM in events
    assert events[V.CHECK_CHECKSUM]["n_failed"] == 0
    assert events[V.CHECK_CHECKSUM]["n_passed"] >= 1
    assert V.CHECK_JSON_SCHEMA in events
    assert events[V.CHECK_JSON_SCHEMA]["n_failed"] == 0
    # every event carries the run identity for correlation
    for ev in events.values():
        assert ev["dataset_id"] and ev["version_id"]


def test_checksum_mismatch_counted_in_family_rollup(spark, store, tmp_path, logcap):
    tree = build_golden_tree(str(tmp_path))
    item = json.load(open(tree["item"]))
    item["assets"]["asset0"]["file:checksum"] = "1220" + "0" * 64
    _write_json(tree["item"], item)
    _ingest(spark, store, tmp_path, tree["root_url"])
    events = _stage_events(logcap)
    assert events[V.CHECK_CHECKSUM]["n_failed"] == 1
    # the other families are unaffected by a checksum-only corruption
    assert events[V.CHECK_JSON_SCHEMA]["n_failed"] == 0


def test_schema_break_counted_in_family_rollup(spark, store, tmp_path, logcap):
    tree = build_golden_tree(str(tmp_path))
    item = json.load(open(tree["item"]))
    del item["properties"]["datetime"]  # required by the Item schema
    _write_json(tree["item"], item)
    _ingest(spark, store, tmp_path, tree["root_url"])
    events = _stage_events(logcap)
    assert events[V.CHECK_JSON_SCHEMA]["n_failed"] >= 1
