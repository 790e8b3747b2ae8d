"""Bucketed co-located join: the one-time-shuffle / zero-shuffle-join
contract. The SMB join over two tables bucketed and sorted on the join
key must plan with no Exchange and no Sort below the join, and its
result must match the plain (shuffled) join exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from geostore_spark.sources.bucketed import cobucketed_revenue_join
from geostore_spark.sources.tables import load_table

from .conftest import SF_DIR


def test_cobucketed_join_is_shuffle_and_sort_free(spark):
    df = cobucketed_revenue_join(spark, SF_DIR, suffix="t1")
    got = [r.asDict() for r in df.collect()]  # execute: AQE final plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # no exchange may feed the join keys (the post-join aggregate's
    # priority-keyed exchange over 5 groups is fine)
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    # bucket-sorted scans: no per-partition sort below the join either
    join_part = plan[plan.index("SortMergeJoin"):]
    scans = [ln for ln in join_part.splitlines() if "FileScan" in ln]
    assert len(scans) >= 2
    assert plan.count("Bucketed: true") >= 2  # AQE prints initial+final

    # result equality with the plain shuffled join
    o = load_table(spark, "orders", SF_DIR).select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, "lineitem", SF_DIR).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    ref = (
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
    assert got == [r.asDict() for r in ref.collect()]
