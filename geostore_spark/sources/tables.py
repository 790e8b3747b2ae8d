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


def load_table_for_compute(
    spark: SparkSession,
    name: str,
    sf_dir: str | None = None,
    keys: list[str] | None = None,
) -> DataFrame:
    """``load_table`` + ``rebalance_for_python``: the scan that feeds a
    CPU-heavy per-row pass (tokenization, shingling, interpreted
    higher-order lambdas, regex extraction).

    Parquet scan parallelism is bounded by ROW GROUPS, not bytes — the
    driver's fixture tables are written as a single row group per file,
    so a plain ``load_table`` hands every downstream per-row expression
    to ONE task regardless of core count (measured r10 at sf1: the
    whole text family ran its split()/zip_with() work on 1-2 of 32
    cores — x_text_repetition 10.4 s of which ~1 task's worth was
    compute). The round-robin rebalance is a no-op when the scan
    already yields at least core-count file splits — the 100 TB regime
    — and in the small-input regime the shuffle moves megabytes. Plain
    scans (point lookups, pushdown-sensitive filters) should keep using
    ``load_table``: filters still push through the repartition, but a
    limit-1 probe has no business paying an exchange.

    ``keys`` switches the rebalance from round-robin to a hash
    repartition on those columns (see ``rebalance_for_python``): use it
    when the whole downstream plan is clustered on the key, so the one
    scan exchange also serves every groupBy/window/join keyed by it."""
    from geostore_spark.operators.util import rebalance_for_python

    return rebalance_for_python(load_table(spark, name, sf_dir), keys=keys)


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


# DataFrame *plans* are immutable — memoize per (session, path) so repeated
# loads skip the eager footer read schema inference costs (~50 ms each; a
# 70-query suite re-reads footers ~100×). Keyed on the session id so a new
# session never sees another session's plan objects.
_PLAN_CACHE: dict[tuple[str, str], DataFrame] = {}


_CONF_APPLIED: set[str] = set()


def _ensure_engine_conf(spark: SparkSession) -> None:
    """Apply the engine-wide session conventions exactly once per session.

    ``build_session`` already sets these at construction; this covers the
    engine-must-work-on-ANY-SparkSession case (reference keeps
    table-access settings inside the model layer too:
    /root/reference/geostore/models.py). Unconditional and
    order-independent on purpose: setting them lazily inside a
    data-dependent branch would change the semantics of timestamp
    expressions session-wide depending on WHICH table loaded first.

    - ``nanosAsLong``: events.parquet carries TIMESTAMP(NANOS), which
      Spark 4.x refuses to read natively.
    - session timezone UTC: engine-wide convention (matching the DuckDB
      oracle) — fixture wall-clocks ARE UTC instants, so NTZ→LTZ casts
      stay value-preserving on any host zone.
    """
    app_id = spark.sparkContext.applicationId
    if app_id in _CONF_APPLIED:
        return
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    _CONF_APPLIED.add(app_id)


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or default_sf_dir()
    path = f"{sf_dir}/{name}.parquet"
    key = (spark.sparkContext.applicationId, path)
    cached = _PLAN_CACHE.get(key)
    if cached is not None:
        return cached
    _ensure_engine_conf(spark)
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
        # resolve (value-preserving under the UTC session zone above).
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _PLAN_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every fixture table as a temp view for spark.sql plans."""
    for name in TABLE_NAMES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)


def fixture_tag(sf_dir: str, tables: tuple[str, ...] | list[str]) -> str:
    """8-hex tag identifying BOTH a fixture path and the data it holds:
    folds each table file's (size, mtime_ns) into the path digest, so a
    durable storage layout (bucketed/partitioned warehouse table) keyed
    by this tag can never silently serve rows from a REGENERATED
    fixture at the same path — the stat changes, the tag changes, the
    stale layout is simply never found (r6 advisor finding).
    Non-statable paths (object-store URIs) fold a constant instead:
    those fixtures are not regenerated in place, and a production
    deployment keys layouts on table VERSION, not file stats."""
    import hashlib

    h = hashlib.sha256(sf_dir.encode())
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        try:
            st = os.stat(p)
            h.update(f"|{t}:{st.st_size}:{st.st_mtime_ns}".encode())
        except OSError:
            h.update(f"|{t}:unstat".encode())
    return h.hexdigest()[:8]
