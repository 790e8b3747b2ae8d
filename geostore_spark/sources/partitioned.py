"""Partitioned (directory-pruned) tables: the scan-elimination path.

The reference lays assets out under dataset-prefixed keys so any
operation touches only its own prefix (``geostore/s3_utils.py`` prefix
layout; the import fan-out routes per-dataset). The Spark-native
analog at 100 TB is HIVE-STYLE PARTITIONING: write the fact table
partitioned on a coarse predicate column once, and every query that
filters on it reads ONLY the matching directories — the scan cost
tracks the selected slice, not the table. Partition pruning is the
single highest-leverage storage decision for time-filtered pipelines
(every training-data run selects a crawl window); bucketing
(``sources/bucketed.py``) kills the join shuffle, partitioning kills
the scan itself.

Granularity note: partition by YEAR here (7 values at the fixture's
date range) — production picks day/hour so one partition is
~file-count friendly (thousands of files per partition at 100 TB is
fine; millions of tiny partitions is the classic small-files failure).
The write is once per (SF, suffix) — write-if-absent, amortized across
every downstream query, same discipline as the bucketed tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geostore_spark.operators.util import quantize
from geostore_spark.sources.bucketed import save_table_clearing_stale_dir
from geostore_spark.sources.tables import fixture_tag, load_table

PRUNE_YEAR = 1995


def partition_cols(spark: SparkSession, table: str) -> list[str]:
    """Partition columns of an existing catalog table ([] when absent
    or unpartitioned) — the write-if-absent probe's layout check."""
    if not spark.catalog.tableExists(table):
        return []
    try:
        rows = spark.sql(f"SHOW PARTITIONS {table}").collect()
    except Exception:
        return []
    if not rows:
        return []
    first = rows[0][0]
    return [kv.split("=")[0] for kv in first.split("/")]


def ensure_partitioned_orders(spark: SparkSession, sf: str) -> str:
    """Write orders partitioned by order year — only if absent — and
    return the table name (keyed on the SF digest plus the fixture
    file's stat fingerprint, so a catalog hit is guaranteed to hold
    THIS fixture's rows even after in-place regeneration)."""
    tag = fixture_tag(sf, ("orders",))
    table = f"orders_part_{tag}"
    if partition_cols(spark, table) == ["o_year"]:
        return table
    # a fresh session's catalog is empty but the partitioned files are
    # durable: adopt them (then recover the partition entries) instead
    # of re-paying the layout write
    if not spark.catalog.tableExists(table):
        from geostore_spark.sources.bucketed import adopt_existing_table

        if adopt_existing_table(
            spark,
            table,
            "PARTITIONED BY (o_year)",
            "o_orderkey bigint, o_totalprice double, "
            "o_orderdate timestamp, o_year int",
        ):
            spark.sql(f"MSCK REPAIR TABLE {table}")
            if partition_cols(spark, table) == ["o_year"]:
                return table
            spark.sql(f"DROP TABLE IF EXISTS {table}")  # unexpected spec
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    df = load_table(spark, "orders", sf).select(
        "o_orderkey",
        "o_totalprice",
        "o_orderdate",
        F.year("o_orderdate").alias("o_year"),
    )
    w = df.write.format("parquet").mode("overwrite").partitionBy("o_year")
    save_table_clearing_stale_dir(w, spark, table)
    return table


def _register_query() -> None:
    from geostore_spark.registry import register

    @register(
        "x_storage_partition_prune",
        "Partition-pruned scan as a registered, oracle-checked query: "
        "orders are written partitioned by year (once per SF — "
        "write-if-absent, the same amortization discipline as the "
        "bucketed tables), then a one-year monthly revenue rollup reads "
        "ONLY that year's directory — the plan's FileScan carries the "
        "year as a PartitionFilter (pinned by tests/test_bucketed.py), "
        "so at 100 TB the scan cost tracks the selected window, not "
        "the table. The oracle is the plain full-scan filter — "
        "identical rows prove the layout changes THE SCAN, not the "
        "answer.",
        f"""SELECT month(o_orderdate) AS month,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS revenue_cents
            FROM orders
            WHERE year(o_orderdate) = {PRUNE_YEAR}
            GROUP BY month ORDER BY month""",
    )
    def q_partition_prune(spark: SparkSession, sf: str) -> DataFrame:
        table = ensure_partitioned_orders(spark, sf)
        return (
            spark.table(table)
            .filter(F.col("o_year") == PRUNE_YEAR)
            .groupBy(F.month("o_orderdate").alias("month"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(quantize(F.col("o_totalprice"), 100))
                .cast("bigint")
                .alias("revenue_cents"),
            )
            .orderBy("month")
        )


_register_query()
