"""Multihash checksum verification (V6) — distributed, constant-memory.

Mirrors /root/reference/geostore/check_files_checksums/utils.py:27-31,89-129:
a multihash is ``<fn-code hex><length hex><digest hex>`` (sha2-256 =
``1220`` + 64 hex chars); the file is streamed in chunks so memory stays
constant regardless of object size — at the 100 TB design point the
``binaryFile`` source is unusable (it materializes whole files), so the
executor streams from the filesystem inside ``mapInPandas``.

The reference fanned this out as an AWS Batch array job with one container
per asset index (task.py:45-69); Spark's task scheduling over partitions
replaces the manual index arithmetic (op V7) — ``repartition`` on the
asset rows is the whole fan-out story.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

CHUNK_SIZE = 8 * 1024 * 1024  # constant-memory streaming; reference used 1 KiB
SHA2_256_PREFIX = "1220"

RESULT_SCHEMA = (
    "url string, multihash string, actual_digest string, result string, message string"
)


def _verify_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for url, multihash in zip(pdf["url"], pdf["multihash"]):
            try:
                digest = hashlib.sha256()
                with open(url, "rb") as f:  # local-path stand-in for object storage
                    while True:
                        chunk = f.read(CHUNK_SIZE)
                        if not chunk:
                            break
                        digest.update(chunk)
                actual = digest.hexdigest()
            except OSError as err:
                out.append((url, multihash, None, "Failed", f"unreadable: {err}"))
                continue
            if multihash is None:
                out.append((url, None, actual, "Failed", "missing multihash"))
            elif not multihash.startswith(SHA2_256_PREFIX):
                out.append((url, multihash, actual, "Failed", f"unsupported multihash fn {multihash[:4]}"))
            elif multihash[4:] == actual:
                out.append((url, multihash, actual, "Passed", None))
            else:
                out.append(
                    (url, multihash, actual, "Failed",
                     f"expected {multihash[4:]}, got {actual}")
                )
        yield pd.DataFrame(out, columns=["url", "multihash", "actual_digest", "result", "message"])


def verify_checksums(asset_rows: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Stream-hash every DATA asset row (url, multihash) and compare.

    Repartitioning spreads assets across executors — each file is hashed
    exactly once, in chunks, wherever its task lands.
    """
    df = asset_rows.select("url", "multihash")
    if parallelism:
        df = df.repartition(parallelism)
    return df.mapInPandas(_verify_batch, RESULT_SCHEMA)


def sha256_multihash(payload: bytes) -> str:
    return SHA2_256_PREFIX + hashlib.sha256(payload).hexdigest()
