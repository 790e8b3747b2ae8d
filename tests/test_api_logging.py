"""Dataset-endpoint request/outcome logging contract, mirroring the
reference's endpoint logging tests
(/root/reference/tests/test_dataset_versions_endpoint_logging.py::
should_log_payload and the datasets-endpoint pattern): every handler
logs one "API Request" event with its scalar params on entry and one
"API Response" event with the status code on exit — success AND failure
paths."""

from __future__ import annotations

import logging
import random
from datetime import datetime, timezone

import pytest

from geostore_spark.api.datasets import (
    create_dataset,
    delete_dataset,
    get_dataset,
    list_datasets,
    update_dataset,
)
from geostore_spark.logging_keys import (
    LOGGER_NAME,
    LOG_MESSAGE_API_REQUEST,
    LOG_MESSAGE_API_RESPONSE,
)
from geostore_spark.sources.store import MetadataStore

NOW = datetime(2026, 1, 2, 3, 4, 5, 678000, tzinfo=timezone.utc)


@pytest.fixture()
def store(spark, tmp_path):
    return MetadataStore(spark, str(tmp_path / "store"))


@pytest.fixture()
def logcap(caplog):
    caplog.set_level(logging.INFO, logger=LOGGER_NAME)
    return caplog


def _events(caplog, message):
    return [
        r.event
        for r in caplog.records
        if r.name == LOGGER_NAME and r.message == message
    ]


def test_create_logs_request_params_and_created_status(store, logcap):
    create_dataset(store, "Logged_DS", now=NOW, rng=random.Random(7))
    [req] = [
        e
        for e in _events(logcap, LOG_MESSAGE_API_REQUEST)
        if e["handler"] == "create_dataset"
    ]
    # scalar params logged by name; store handle and rng never
    assert req["params"]["title"] == "Logged_DS"
    assert "store" not in req["params"] and "rng" not in req["params"]
    [resp] = [
        e
        for e in _events(logcap, LOG_MESSAGE_API_RESPONSE)
        if e["handler"] == "create_dataset"
    ]
    assert resp["status_code"] == 201


def test_failure_paths_log_their_status(store, logcap):
    create_dataset(store, "Dup_DS", now=NOW, rng=random.Random(8))
    logcap.clear()
    create_dataset(store, "Dup_DS", now=NOW, rng=random.Random(9))  # 409
    get_dataset(store, dataset_id="missing")  # 404
    update_dataset(store, "missing", "bad title!")  # 400
    codes = [
        e["status_code"] for e in _events(logcap, LOG_MESSAGE_API_RESPONSE)
    ]
    assert codes == [409, 404, 400]
    # every response event pairs with a request event from the same handler
    handlers_req = [e["handler"] for e in _events(logcap, LOG_MESSAGE_API_REQUEST)]
    handlers_resp = [e["handler"] for e in _events(logcap, LOG_MESSAGE_API_RESPONSE)]
    assert handlers_req == handlers_resp


def test_list_get_delete_roundtrip_logged(store, tmp_path, logcap):
    created = create_dataset(store, "Round_DS", now=NOW, rng=random.Random(10))
    ds_id = created["body"]["id"]
    logcap.clear()
    list_datasets(store)
    get_dataset(store, dataset_id=ds_id)
    delete_dataset(store, ds_id, str(tmp_path / "storage"))
    codes = [
        (e["handler"], e["status_code"])
        for e in _events(logcap, LOG_MESSAGE_API_RESPONSE)
    ]
    assert codes == [
        ("list_datasets", 200),
        ("get_dataset", 200),
        ("delete_dataset", 204),
    ]
    # positional params are still captured by name via signature binding
    [req] = [
        e
        for e in _events(logcap, LOG_MESSAGE_API_REQUEST)
        if e["handler"] == "delete_dataset"
    ]
    assert req["params"]["dataset_id"] == ds_id
