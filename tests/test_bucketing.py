"""Bucketed-table co-located join: the 100 TB shuffle-elimination path.

At cluster scale the biggest recurring cost in a star join is shuffling
the fact table on the join key for every query. Writing both sides
bucketed on that key (`bucketBy` + `sortBy`) pre-partitions the data on
disk, so Catalyst proves the co-location and plans the join with ZERO
exchanges — the per-query shuffle becomes a one-time write cost. These
tests pin that plan property, not just the row counts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geostore_spark.sources.tables import load_table

from .conftest import SF_DIR

N_BUCKETS = 4


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    """orders + customer written bucketed on the join key."""
    # external tables with explicit paths: warehouse.dir is a static
    # conf, but bucket metadata lives in the catalog either way
    warehouse = tmp_path_factory.mktemp("bucketed-warehouse")
    orders = load_table(spark, "orders", SF_DIR)
    customer = load_table(spark, "customer", SF_DIR)
    (
        orders.write.mode("overwrite")
        .bucketBy(N_BUCKETS, "o_custkey")
        .sortBy("o_custkey")
        .option("path", str(warehouse / "bkt_orders"))
        .saveAsTable("bkt_orders")
    )
    (
        customer.write.mode("overwrite")
        .bucketBy(N_BUCKETS, "c_custkey")
        .sortBy("c_custkey")
        .option("path", str(warehouse / "bkt_customer"))
        .saveAsTable("bkt_customer")
    )
    yield spark.table("bkt_orders"), spark.table("bkt_customer")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_customer")


def test_bucketed_join_has_zero_exchanges(spark, bucketed):
    orders, customer = bucketed
    # disable broadcast so the test proves bucketing (not broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must not shuffle either side: bucket layout IS
        # the partitioning. (The final 5-row groupBy rollup may exchange.)
        join_part = plan[: plan.index("SortMergeJoin")] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan
        below_join = plan[plan.index("SortMergeJoin") :]
        assert "Exchange hashpartitioning(o_custkey" not in below_join
        assert "Exchange hashpartitioning(c_custkey" not in below_join
        assert join_part is not None
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_join_matches_unbucketed_results(spark, bucketed, duck):
    orders, customer = bucketed
    got = {
        r["c_mktsegment"]: r["n"]
        for r in orders.join(
            customer, orders.o_custkey == customer.c_custkey
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {
        seg: n
        for seg, n in duck.execute(
            "SELECT c_mktsegment, COUNT(*) FROM orders "
            "JOIN customer ON o_custkey = c_custkey GROUP BY 1"
        ).fetchall()
    }
    assert got == want
