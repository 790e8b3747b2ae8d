"""Skew-utility invariants: salted/two-phase shapes return exactly the
naive plans' results on a deliberately skewed input (90% one key)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from geostore_spark.operators.skew import salted_aggregate, two_phase_distinct_count


def _skewed_df(spark, n=20_000):
    rng = random.Random(99)
    rows = [
        ("hot" if rng.random() < 0.9 else f"k{rng.randint(0, 50)}", rng.randint(0, 500))
        for _ in range(n)
    ]
    return spark.createDataFrame(rows, "k string, v long").repartition(16)


def test_salted_aggregate_matches_naive(spark):
    df = _skewed_df(spark)
    naive = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["n"], int(r["sum_v"]), r["min_v"], r["max_v"])
        for r in salted_aggregate(df, ["k"], "v").collect()
    }
    assert salted == naive


def test_two_phase_distinct_matches_naive(spark):
    df = _skewed_df(spark)
    naive = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    two_phase = {
        r["k"]: r["n_distinct"]
        for r in two_phase_distinct_count(df, ["k"], "v").collect()
    }
    assert two_phase == naive


def test_aqe_splits_skewed_sort_merge_join(spark):
    """The session enables AQE skew-join splitting; this pins that it
    actually ENGAGES on a hot-key join (the runtime re-plan the 100 TB
    story leans on: one 95%-hot shuffle partition is split across tasks
    with the matching build rows replicated, no salting needed). The
    marker is `SortMergeJoin(skew=true)` in the final adaptive plan;
    the result must equal the closed-form expectation."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8192",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8192",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        n_left, n_right = 2_000_000, 2_000
        left = spark.range(n_left).select(
            F.when(F.col("id") % 20 < 19, F.lit(7))
            .otherwise(F.col("id"))
            .alias("k"),
            F.lit(1).alias("payload"),
        )
        right = spark.range(n_right).select(
            F.col("id").alias("k"), F.lit(1).alias("w")
        )
        j = (
            left.join(right, "k")
            .groupBy()
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )
        [row] = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE skew split did not engage"
        # hot key 7 matches once; cold keys id (id%20==19, id<2000) match once
        cold = sum(
            1 for i in range(n_left) if i % 20 == 19 and i < n_right
        )
        assert row["n"] == (n_left * 19) // 20 + cold
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
