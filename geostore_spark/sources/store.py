"""Snapshot-versioned parquet metadata store.

The reference keeps its metadata in three DynamoDB tables with
read-after-write consistency and a FIFO-serialized single writer for the
catalog (/root/reference/geostore/datasets_model.py,
processing_assets_model.py, validation_results_model.py;
infrastructure/constructs/processing.py:113-140). The Spark-first
equivalent is Delta; this container has no delta-spark, so the store
implements the same guarantees with plain parquet + an atomically swapped
version pointer:

- every write produces a NEW immutable snapshot directory ``v{n}``;
- ``_LATEST`` is swapped with ``os.replace`` (atomic on POSIX), so readers
  always see a complete snapshot — never a partial write;
- snapshot lineage gives time travel for free (old snapshots remain);
- ``merge`` is the Delta ``MERGE INTO`` shape (matched-update /
  not-matched-insert) expressed as a join + union rewrite.

Single-writer discipline (the reference's FIFO queue, op T5) is the
caller's job here, as it is with Delta's optimistic concurrency.

At 100 TB these tables are *metadata* (datasets, assets, validation
results) — orders of magnitude smaller than the data they describe; the
rewrite-on-merge cost is bounded and the swap is O(1).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# Decoded schemas (FIXTURES.md B1-B3, B5): no '#'-encoded composite keys —
# the reference's pk/sk prefixes become real columns.
SCHEMAS: dict[str, str] = {
    "datasets": (
        "dataset_id string, title string, created_at timestamp, "
        "updated_at timestamp, current_dataset_version string"
    ),
    "processing_assets": (
        "dataset_id string, version_id string, asset_type string, "
        "item_index long, url string, filename string, multihash string, "
        "exists_in_staging boolean, replaced_in_new_version boolean"
    ),
    "validation_results": (
        "dataset_id string, version_id string, check string, url string, "
        "result string, details map<string,string>"
    ),
    "pipeline_runs": (
        "execution_id string, dataset_id string, version_id string, "
        "title string, status string, validation_success boolean, "
        "asset_job_status string, metadata_job_status string, "
        "started_at timestamp, stopped_at timestamp"
    ),
    "catalog": (
        "url string, stac_type string, dataset_id string, title string, "
        "parent_url string, etag string"
    ),
}


class MetadataStore:
    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- snapshot plumbing --------------------------------------------------

    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _pointer(self, table: str) -> str:
        return os.path.join(self._table_dir(table), "_LATEST")

    def current_version(self, table: str) -> int:
        try:
            with open(self._pointer(table)) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return -1

    def _swap_pointer(self, table: str, version: int) -> None:
        d = self._table_dir(table)
        fd, tmp = tempfile.mkstemp(dir=d, prefix="_LATEST.")
        with os.fdopen(fd, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._pointer(table))  # atomic commit

    def _write_snapshot(self, table: str, df: DataFrame) -> None:
        version = self.current_version(table) + 1
        path = os.path.join(self._table_dir(table), f"v{version}")
        df.write.mode("errorifexists").parquet(path)
        self._swap_pointer(table, version)

    # -- public API ----------------------------------------------------------

    def schema(self, table: str) -> StructType:
        return StructType.fromDDL(SCHEMAS[table])

    def read(self, table: str) -> DataFrame:
        version = self.current_version(table)
        if version < 0:
            return self.spark.createDataFrame([], self.schema(table))
        path = os.path.join(self._table_dir(table), f"v{version}")
        return self.spark.read.schema(self.schema(table)).parquet(path)

    def append(self, table: str, df: DataFrame) -> None:
        existing = self.read(table)
        self._write_snapshot(table, existing.unionByName(df.select(existing.columns)))

    def overwrite(self, table: str, df: DataFrame) -> None:
        self._write_snapshot(table, df.select(self.read(table).columns))

    def delete_where(self, table: str, condition: Column) -> None:
        self.overwrite(table, self.read(table).filter(~condition))

    def update_where(self, table: str, condition: Column, assignments: dict[str, Column]) -> None:
        """Delta ``UPDATE SET ... WHERE ...`` equivalent."""
        df = self.read(table)
        for col, expr in assignments.items():
            df = df.withColumn(col, F.when(condition, expr).otherwise(F.col(col)))
        self._write_snapshot(table, df)

    def merge(
        self,
        table: str,
        source: DataFrame,
        on: list[str],
        when_matched_set: dict[str, Column] | None = None,
        insert_not_matched: bool = False,
    ) -> None:
        """Delta ``MERGE INTO`` shape: join target with source on keys;
        matched rows get the assignments, unmatched-source rows are
        inserted when requested (V12 idempotent child-add)."""
        target = self.read(table)
        marked_src = source.select(*on).distinct().withColumn("__hit", F.lit(True))
        joined = target.join(marked_src, on, "left")
        updated = joined
        for col, expr in (when_matched_set or {}).items():
            updated = updated.withColumn(
                col, F.when(F.col("__hit").isNotNull(), expr).otherwise(F.col(col))
            )
        result = updated.drop("__hit")
        if insert_not_matched:
            new_rows = source.join(target.select(*on).distinct(), on, "left_anti")
            result = result.unionByName(new_rows.select(result.columns))
        self._write_snapshot(table, result)
