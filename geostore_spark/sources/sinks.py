"""Analytical-layout parquet sinks: partitioned, bucketed, compacted.

The reference only ever copies assets byte-for-byte into a versioned
prefix (geostore/import_dataset_file.py — S3 object copy). An analytics
engine's write path decides most of its read-path economics at 100 TB,
so these sinks encode the three layout decisions that matter:

- **Partitioned writes** (`write_partitioned`): directory partitioning
  on low-cardinality columns turns predicates into partition PRUNING
  (files never opened), and `sort_by` clusters rows inside each file so
  parquet row-group min/max statistics skip pages for range predicates
  (the Z-order key from operators/spatial.py is a natural sort_by).
- **Bucketed writes** (`write_bucketed`): pre-hash-partitioning both
  sides of a recurring join key eliminates the shuffle from every
  subsequent join/aggregation on that key — the single biggest cost in
  a repeated 100 TB join pipeline. tests/test_sinks.py pins the
  no-Exchange plan.
- **Compaction** (`compact_parquet`): streaming/incremental ingestion
  leaves small files; scans then pay per-file open + scheduling.
  Bin-packs a directory into ~target-sized files, sized from the actual
  input bytes (driver-side listing is metadata-only).

All three are thin over the DataFrame writer on purpose: layout policy
belongs in the writer API, not in bespoke file shuffling.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_by: list[str] | None = None,
    mode: str = "errorifexists",
) -> None:
    """Write ``df`` directory-partitioned by ``partition_by``; rows inside
    each file clustered on ``sort_by`` for row-group statistics skipping.

    The repartition on the partition columns routes each output partition
    to one task (one file per directory instead of one per task per
    directory — the classic small-files mistake); sortWithinPartitions
    then orders rows without a second shuffle.
    """
    out = df.repartition(*partition_by)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    out.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    num_buckets: int,
    path: str,
    sort_by: str | None = None,
) -> None:
    """Save ``df`` as a bucketed table: hash-partitioned into
    ``num_buckets`` files on ``bucket_by`` with the bucket spec recorded
    in the catalog, so joins/aggregations on that key skip their
    Exchange entirely (both sides arrive pre-partitioned).
    """
    writer = df.write.bucketBy(num_buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.option("path", path).saveAsTable(table)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict[str, int]:
    """Bin-pack the parquet files under ``src`` into ``dst`` at
    ~``target_bytes`` per output file. Returns {files_in, files_out,
    bytes_in}. File count comes from measured input bytes, never a
    guess; the repartition is a round-robin shuffle (no key skew).
    """
    bytes_in = _dir_bytes(src)
    files_in = sum(
        1
        for _root, _dirs, files in os.walk(src)
        for f in files
        if f.endswith(".parquet")
    )
    n_out = max(1, -(-bytes_in // target_bytes))  # ceil
    spark.read.parquet(src).repartition(n_out).write.mode("errorifexists").parquet(dst)
    files_out = sum(
        1
        for _root, _dirs, files in os.walk(dst)
        for f in files
        if f.endswith(".parquet")
    )
    return {"files_in": files_in, "files_out": files_out, "bytes_in": bytes_in}
