"""Bucketed (pre-shuffled) tables: the co-located join path.

The reference keeps per-dataset assets grouped by dataset prefix so
version operations never touch other datasets
(``geostore/import_dataset/task.py`` fan-out; ``s3_utils.py`` prefix
layout). The Spark-native analog at 100 TB is TABLE BUCKETING: write
both fact tables bucketed (and sorted) on the join key once, and every
subsequent equi-join on that key is a sort-merge join with NO exchange
and NO sort on either side — the shuffle is paid once at write time and
amortized over every downstream query. This is the single biggest
recurring-cost lever for a fact-to-fact join pipeline (orders x
lineitem at every SF); ``repartition()`` co-location lasts one plan,
bucketing persists across sessions.

Local note: buckets are files per bucket id under the session
warehouse; on a cluster the same layout is table metadata any reader
session sees. Bucket count is a write-time choice — size it so one
bucket of the LARGER table fits an executor core's working set
(~128-256 MB parquet per bucket at 100 TB scale, i.e. thousands of
buckets; 16 here at toy SF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geostore_spark.sources.tables import load_table


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 16,
    sorted_by_key: bool = True,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally
    sorted) on ``key``. Overwrites any existing table of that name —
    including a stale warehouse directory left by a crashed writer,
    which the catalog's DROP TABLE does not know about."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    shutil.rmtree(f"{wh.path}/{table.lower()}", ignore_errors=True)
    w = df.write.format("parquet").mode("overwrite").bucketBy(buckets, key)
    if sorted_by_key:
        w = w.sortBy(key)
    w.saveAsTable(table)


def cobucketed_revenue_join(
    spark: SparkSession, sf: str, buckets: int = 16, suffix: str = "ord_li"
) -> DataFrame:
    """Write orders and lineitem co-bucketed on the order key, then run
    the classic revenue join. The returned plan must contain a
    SortMergeJoin with NEITHER an Exchange NOR a Sort under either side
    (both scans are bucketed AND bucket-sorted) — pinned by
    tests/test_bucketed.py. The write pays the one-time shuffle; the
    join itself moves zero rows between executors."""
    ot, lt = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    write_bucketed(
        load_table(spark, "orders", sf).select(
            "o_orderkey", "o_orderpriority", "o_totalprice"
        ),
        ot,
        "o_orderkey",
        buckets,
    )
    write_bucketed(
        load_table(spark, "lineitem", sf).select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        lt,
        "l_orderkey",
        buckets,
    )
    o = spark.table(ot)
    # merge hint: at toy SF the optimizer would broadcast instead; at
    # 100 TB two fact tables take the sort-merge path anyway, and the
    # hint makes the demonstrated contract (SMB with no exchange, no
    # sort) deterministic across SFs
    li = spark.table(lt).hint("merge")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100,
                    0,
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("revenue_cents"),
        )
        .orderBy("o_orderpriority")
    )


def _register_query() -> None:
    from geostore_spark.registry import register

    @register(
        "x_storage_bucketed_join",
        "Bucketed co-located join as a registered, oracle-checked query: "
        "both fact tables are written bucketed+sorted on the join key "
        "(the one-time shuffle), then the revenue join runs as a "
        "SortMergeJoin with no exchange and no sort under either side. "
        "The oracle is the plain shuffled join - identical rows prove "
        "the bucketing layout changes THE PLAN, not the answer. At "
        "100 TB this is the amortized-shuffle lever for every "
        "recurring fact-to-fact join.",
        """SELECT o.o_orderpriority,
                  COUNT(*) AS n_items,
                  CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                      * 100) AS BIGINT)) AS BIGINT)
                    AS revenue_cents
           FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
           GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""",
    )
    def q_bucketed_join(spark: SparkSession, sf: str) -> DataFrame:
        return cobucketed_revenue_join(spark, sf, suffix="reg")


_register_query()
