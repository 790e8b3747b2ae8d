"""Object-store opener + per-object import-outcome protocol.

The cluster-real half of the io seam (r8 verdict missing #2): a
boto3-style s3 opener shape, the reference's staging→storage fallback
(s3_utils.py:30-57), and import retry outcomes recorded as queryable
rows with an explicit cap (import_dataset_file.py:46-99).
"""

from __future__ import annotations

import io as _io
import json
import os
from posixpath import basename

import pytest
from pyspark.sql import functions as F

from geostore_spark.pipeline import io as gio
from geostore_spark.pipeline.object_store import (
    MAX_IMPORT_ATTEMPTS,
    RESULT_GIVEN_UP,
    RESULT_PERMANENT,
    RESULT_RETRY,
    RESULT_SUCCEEDED,
    RETRY_RESULT_STRING,
    FallbackOpener,
    S3Opener,
    TemporaryObjectStoreError,
    import_files_with_outcomes,
)


class FlakyReadOpener:
    """Local-file opener whose READ behavior is keyed by file name:
    ``timeout*`` always raises the retryable error, ``flaky*`` raises it
    on the first read only, ``missing*`` is permanently absent. Writes
    pass through. Picklable; the per-url counter lives inside the task's
    unpickled copy, which is exactly where the retry loop runs."""

    def __init__(self, root: str):
        self.root = root
        self.counts: dict[str, int] = {}

    def __call__(self, url: str, mode: str = "rb"):
        name = basename(url)
        path = os.path.join(self.root, name)
        if mode == "rb":
            if name.startswith("missing"):
                raise FileNotFoundError(url)
            if name.startswith("timeout"):
                raise TemporaryObjectStoreError(url)
            if name.startswith("flaky"):
                n = self.counts.get(url, 0)
                self.counts[url] = n + 1
                if n == 0:
                    raise TemporaryObjectStoreError(url)
        return open(path, mode)


@pytest.fixture()
def flaky_scheme(tmp_path):
    root = str(tmp_path / "src")
    os.makedirs(root)
    for name in ("ok.bin", "flaky.bin"):
        with open(os.path.join(root, name), "wb") as f:
            f.write(name.encode() * 3)
    gio.register_scheme("flaky", FlakyReadOpener(root))
    try:
        yield root
    finally:
        gio._OPENERS.pop("flaky", None)


def test_import_outcomes_protocol(spark, flaky_scheme, tmp_path):
    dst_root = tmp_path / "dst"
    os.makedirs(dst_root)
    pairs = spark.createDataFrame(
        [
            (f"flaky://x/{n}", str(dst_root / n))
            for n in ("ok.bin", "flaky.bin", "timeout.bin", "missing.bin")
        ],
        "src_url string, dst_url string",
    )
    out = import_files_with_outcomes(pairs).collect()
    by_src: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r["src_url"], r["attempt"])):
        by_src.setdefault(basename(r["src_url"]), []).append(r)

    ok = by_src["ok.bin"]
    assert [(r["attempt"], r["result_code"]) for r in ok] == [
        (1, RESULT_SUCCEEDED)
    ]
    flaky = by_src["flaky.bin"]
    assert [(r["attempt"], r["result_code"]) for r in flaky] == [
        (1, RESULT_RETRY),
        (2, RESULT_SUCCEEDED),
    ]
    assert flaky[0]["result_string"] == RETRY_RESULT_STRING
    timeout = by_src["timeout.bin"]
    assert [(r["attempt"], r["result_code"]) for r in timeout] == [
        (1, RESULT_RETRY),
        (2, RESULT_RETRY),
        (3, RESULT_GIVEN_UP),
    ]
    assert f"after {MAX_IMPORT_ATTEMPTS} attempts" in timeout[-1]["result_string"]
    missing = by_src["missing.bin"]
    assert [(r["attempt"], r["result_code"]) for r in missing] == [
        (1, RESULT_PERMANENT)
    ]
    assert "FileNotFoundError" in missing[0]["result_string"]
    # copies landed for the successes only
    assert (dst_root / "ok.bin").read_bytes() == b"ok.bin" * 3
    assert (dst_root / "flaky.bin").read_bytes() == b"flaky.bin" * 3
    assert not (dst_root / "timeout.bin").exists()
    assert not (dst_root / "missing.bin").exists()


def test_outcomes_are_queryable(spark, flaky_scheme, tmp_path):
    dst_root = tmp_path / "dstq"
    os.makedirs(dst_root)
    pairs = spark.createDataFrame(
        [
            (f"flaky://x/{n}", str(dst_root / n))
            for n in ("ok.bin", "timeout.bin")
        ],
        "src_url string, dst_url string",
    )
    out = import_files_with_outcomes(pairs)
    counts = {
        r["result_code"]: r["n"]
        for r in out.groupBy("result_code")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert counts == {RESULT_SUCCEEDED: 1, RESULT_RETRY: 2, RESULT_GIVEN_UP: 1}


def test_fallback_opener_staging_then_storage(tmp_path):
    staging = tmp_path / "staging"
    storage = tmp_path / "storage" / "my-dataset"
    os.makedirs(staging)
    os.makedirs(storage)
    (staging / "here.json").write_text("staging-copy")
    (storage / "only-durable.json").write_text("storage-copy")

    opener = FallbackOpener(
        gio.local_open, str(tmp_path / "storage"), "my-dataset"
    )
    # staging hit: served from staging, storage never consulted
    with opener(str(staging / "here.json"), "r") as f:
        assert f.read() == "staging-copy"
    # staging miss -> the storage key is {dataset_title}/{basename}
    # (s3_utils.py:43 parity)
    with opener(str(staging / "only-durable.json"), "r") as f:
        assert f.read() == "storage-copy"
    # both missing: the STORAGE lookup's error propagates
    with pytest.raises(FileNotFoundError):
        opener(str(staging / "nowhere.json"), "r")


def test_traversal_through_fallback_scheme(spark):
    """Pipeline e2e through a registered non-file scheme WITH fallback:
    the catalog lives in staging, the item only in durable storage —
    traversal reads both through one FallbackOpener registration."""
    from geostore_spark.pipeline.traversal import traverse

    docs = {
        "fb://staging/catalog.json": json.dumps(
            {
                "type": "Catalog", "id": "c", "stac_version": "1.0.0",
                "description": "d",
                "links": [{"rel": "child", "href": "fb://staging/item.json"}],
            }
        ),
        # item.json is ABSENT from staging; present at the derived
        # storage location {storage_base}/{dataset_title}/{basename}
        "fb://durable/ds-title/item.json": json.dumps(
            {
                "type": "Feature", "id": "i", "stac_version": "1.0.0",
                "assets": {}, "links": [],
            }
        ),
    }

    def dict_opener(url, mode="r"):
        if url not in docs:
            raise FileNotFoundError(url)
        return _io.StringIO(docs[url])

    gio.register_scheme(
        "fb", FallbackOpener(dict_opener, "fb://durable", "ds-title")
    )
    try:
        out = traverse(spark, "fb://staging/catalog.json")
        urls = {r["url"] for r in out.collect()}
        # the traversal saw the staging URL; the fallback served it
        assert urls == {
            "fb://staging/catalog.json",
            "fb://staging/item.json",
        }
    finally:
        gio._OPENERS.pop("fb", None)


def test_s3_opener_is_picklable_and_read_only():
    import pickle

    op = S3Opener(region_name="ap-southeast-2")
    clone = pickle.loads(pickle.dumps(op))
    assert clone.region_name == "ap-southeast-2"
    assert clone._client is None  # the live client never pickles
    with pytest.raises(ValueError, match="reads only"):
        clone("s3://b/k", "wb")


def _stubbed_opener():
    import boto3
    from botocore.stub import Stubber

    op = S3Opener(region_name="us-east-1")
    op._client = boto3.client(
        "s3",
        region_name="us-east-1",
        aws_access_key_id="x",
        aws_secret_access_key="x",
    )
    return op, Stubber(op._client)


def test_s3_opener_maps_nosuchkey_to_file_not_found():
    op, stub = _stubbed_opener()
    stub.add_client_error(
        "get_object", service_error_code="NoSuchKey", http_status_code=404
    )
    with stub:
        with pytest.raises(FileNotFoundError):
            op("s3://bucket/missing.json")


def test_s3_opener_maps_request_timeout_to_retryable():
    op, stub = _stubbed_opener()
    stub.add_client_error(
        "get_object", service_error_code="RequestTimeout", http_status_code=400
    )
    with stub:
        with pytest.raises(TemporaryObjectStoreError):
            op("s3://bucket/slow.json")


def test_s3_opener_returns_readable_body():
    import io as _bio

    op, stub = _stubbed_opener()
    stub.add_response(
        "get_object",
        {"Body": _bio.BytesIO(b"payload")},
        {"Bucket": "bucket", "Key": "a/b.json"},
    )
    with stub:
        assert op("s3://bucket/a/b.json").read() == b"payload"


def test_ingest_copy_protocol_retries_opener_transients(tmp_path):
    """The ingest pipeline's one-row-per-object copy protocol shares the
    retryable classification: a registered opener raising
    TemporaryObjectStoreError (the S3Opener RequestTimeout signal) is
    retried there exactly like its own injected timeouts."""
    from geostore_spark.pipeline.ingest import (
        RESULT_CODE_SUCCEEDED,
        RESULT_CODE_TEMPORARY_FAILURE,
        _copy_with_retry,
    )

    root = str(tmp_path / "src2")
    os.makedirs(root)
    for name in ("flaky.bin", "ok.bin"):
        with open(os.path.join(root, name), "wb") as f:
            f.write(b"z" * 10)
    openers = {"": gio.local_open, "file": gio.local_open,
               "flaky": FlakyReadOpener(root)}
    code, attempts, _ = _copy_with_retry(
        "flaky://x/flaky.bin", str(tmp_path / "o1"), None, openers
    )
    assert (code, attempts) == (RESULT_CODE_SUCCEEDED, 2)
    code, attempts, msg = _copy_with_retry(
        "flaky://x/timeout.bin", str(tmp_path / "o2"), None, openers
    )
    assert code == RESULT_CODE_TEMPORARY_FAILURE and attempts == 3
