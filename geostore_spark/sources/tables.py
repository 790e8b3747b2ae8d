"""Fixture table registry.

Loads the driver-generated parquet tables (TESTDATA.md) and normalizes the
one schema quirk: ``events.ts`` is written as parquet timestamp[ns], which
Spark 4.x only reads as LONG under ``spark.sql.legacy.parquet.nanosAsLong``.
We rebuild a microsecond timestamp so downstream plans treat it as a normal
timestamp column (DuckDB reads the nanos natively, so the oracle agrees once
both are truncated to micros).

Scale note: these are plain columnar scans — filters and projections placed
on the returned DataFrames push down to the parquet reader (verified via
``.explain``: PushedFilters / ReadSchema), which is the whole game at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


# DataFrame *plans* are immutable — memoize per (session, path) so repeated
# loads skip the eager footer read schema inference costs (~50 ms each; a
# 70-query suite re-reads footers ~100×). Keyed on the session id so a new
# session never sees another session's plan objects.
_PLAN_CACHE: dict[tuple[str, str], DataFrame] = {}


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or default_sf_dir()
    path = f"{sf_dir}/{name}.parquet"
    key = (spark.sparkContext.applicationId, path)
    cached = _PLAN_CACHE.get(key)
    if cached is not None:
        return cached
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS) which Spark 4.x refuses to
        # read unless nanosAsLong is on.  It's a runtime SQLConf, so set it
        # here instead of relying on the caller's session having been built by
        # geostore_spark.session — the engine must work on ANY SparkSession
        # (reference keeps table-access settings inside the model layer too:
        # /root/reference/geostore/models.py).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    ts_type = dict(df.dtypes).get("ts")
    if name == "events" and ts_type == "bigint":
        # nanos-as-long → real timestamp (micros); keeps the column usable by
        # every built-in date/time function JVM-side.
        # integer div: float division loses precision at ~1e18 ns epochs
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif name == "events" and ts_type == "timestamp_ntz":
        # Fixtures written with micros + isAdjustedToUTC=false read as
        # TIMESTAMP_NTZ; normalize to TIMESTAMP so unix_micros/date funcs
        # resolve. Engine convention (matching the DuckDB oracle): event
        # wall-clocks ARE UTC instants, so pin the session zone before the
        # cast — on a UTC host this is a no-op, elsewhere it keeps the
        # NTZ→LTZ cast value-preserving instead of shifting by host offset.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _PLAN_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every fixture table as a temp view for spark.sql plans."""
    for name in TABLE_NAMES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
