"""Dataset CRUD with the reference's request/response semantics.

Mirrors /root/reference/geostore/datasets/{create,get,list,update,delete}.py
and api_responses.py:12-17: every handler returns ``{"status_code": int,
"body": ...}``; titles must match the Unicode-aware pattern (macron
characters allowed, geostore/dataset_properties.py:3-4); duplicate titles
conflict (409); missing ids 404; delete requires the dataset's storage
prefix to be empty (geostore/datasets/delete.py:53-63).

DynamoDB ops become metadata-store reads/writes; the GSI title lookup is a
plain equality filter (Catalyst pushes it to the scan); read-after-write
consistency comes from the store's atomic snapshot swap.
"""

from __future__ import annotations

import functools
import inspect
import os
import random
import re
from datetime import datetime, timezone

from pyspark.sql import functions as F

from geostore_spark.logging_keys import (
    LOG_MESSAGE_API_REQUEST,
    LOG_MESSAGE_API_RESPONSE,
    log_event,
)
from geostore_spark.pipeline.ulid import ulid
from geostore_spark.sources.store import MetadataStore

TITLE_PATTERN = re.compile(r"^[āēīōūĀĒĪŌŪa-zA-Z0-9_-]+$")


def _endpoint(fn):
    """Request/outcome logging contract (reference: the Lambda
    entrypoints log their payload on entry and their result status —
    tests/test_dataset_versions_endpoint_logging.py::should_log_payload
    pattern). Scalar params are logged by name; never the store handle
    or row payloads."""

    sig = inspect.signature(fn)

    @functools.wraps(fn)
    def wrapped(store, *args, **kwargs):
        bound = sig.bind(store, *args, **kwargs)
        params = {
            k: v
            for k, v in bound.arguments.items()
            if k != "store" and (v is None or isinstance(v, (str, int, bool)))
        }
        log_event(LOG_MESSAGE_API_REQUEST, handler=fn.__name__, params=params)
        resp = fn(store, *args, **kwargs)
        log_event(
            LOG_MESSAGE_API_RESPONSE,
            handler=fn.__name__,
            status_code=resp["status_code"],
        )
        return resp

    return wrapped


def _resp(status_code: int, body) -> dict:
    return {"status_code": status_code, "body": body}


def _row_to_body(row) -> dict:
    return {
        "id": row["dataset_id"],
        "title": row["title"],
        "created_at": row["created_at"].isoformat(),
        "updated_at": row["updated_at"].isoformat(),
        "current_dataset_version": row["current_dataset_version"],
    }


@_endpoint
def create_dataset(
    store: MetadataStore,
    title: str,
    now: datetime | None = None,
    rng: random.Random | None = None,
) -> dict:
    if not isinstance(title, str) or not TITLE_PATTERN.match(title):
        return _resp(400, {"message": f"Bad Request: invalid title {title!r}"})
    datasets = store.read("datasets")
    # duplicate-title guard as an existence probe (J1 semi-join semantics)
    if datasets.filter(F.col("title") == title).limit(1).count() > 0:
        return _resp(409, {"message": f"Conflict: dataset '{title}' already exists"})
    now = now or datetime.now(timezone.utc)
    dataset_id = ulid(now, rng)
    row_df = store.spark.createDataFrame(
        [(dataset_id, title, now, now, None)], store.schema("datasets")
    )
    store.append("datasets", row_df)
    created = store.read("datasets").filter(F.col("dataset_id") == dataset_id).collect()[0]
    return _resp(201, _row_to_body(created))


@_endpoint
def get_dataset(store: MetadataStore, dataset_id: str | None = None, title: str | None = None) -> dict:
    datasets = store.read("datasets")
    if dataset_id is not None:
        rows = datasets.filter(F.col("dataset_id") == dataset_id).collect()
        if not rows:
            return _resp(404, {"message": f"Not Found: dataset {dataset_id!r}"})
        return _resp(200, _row_to_body(rows[0]))
    if title is not None:  # the reference's title-GSI lookup
        rows = datasets.filter(F.col("title") == title).collect()
        if not rows:
            return _resp(404, {"message": f"Not Found: dataset with title {title!r}"})
        return _resp(200, _row_to_body(rows[0]))
    return _resp(400, {"message": "Bad Request: id or title required"})


@_endpoint
def list_datasets(store: MetadataStore) -> dict:
    rows = store.read("datasets").orderBy("dataset_id").collect()
    return _resp(200, [_row_to_body(r) for r in rows])


@_endpoint
def update_dataset(
    store: MetadataStore, dataset_id: str, new_title: str, now: datetime | None = None
) -> dict:
    if not TITLE_PATTERN.match(new_title):
        return _resp(400, {"message": f"Bad Request: invalid title {new_title!r}"})
    datasets = store.read("datasets")
    if datasets.filter(F.col("dataset_id") == dataset_id).limit(1).count() == 0:
        return _resp(404, {"message": f"Not Found: dataset {dataset_id!r}"})
    if (
        datasets.filter(
            (F.col("title") == new_title) & (F.col("dataset_id") != dataset_id)
        ).limit(1).count()
        > 0
    ):
        return _resp(409, {"message": f"Conflict: dataset '{new_title}' already exists"})
    now = now or datetime.now(timezone.utc)
    store.update_where(
        "datasets",
        F.col("dataset_id") == dataset_id,
        {"title": F.lit(new_title), "updated_at": F.lit(now)},
    )
    row = store.read("datasets").filter(F.col("dataset_id") == dataset_id).collect()[0]
    return _resp(200, _row_to_body(row))


@_endpoint
def delete_dataset(store: MetadataStore, dataset_id: str, storage_root: str) -> dict:
    datasets = store.read("datasets")
    rows = datasets.filter(F.col("dataset_id") == dataset_id).collect()
    if not rows:
        return _resp(404, {"message": f"Not Found: dataset {dataset_id!r}"})
    title = rows[0]["title"]
    # emptiness probe (J2 anti-join / MaxKeys=1 semantics):
    prefix = os.path.join(storage_root, title)
    if os.path.isdir(prefix) and any(os.scandir(prefix)):
        return _resp(409, {"message": f"Conflict: dataset '{title}' is not empty"})
    store.delete_where("datasets", F.col("dataset_id") == dataset_id)
    return _resp(204, {})
