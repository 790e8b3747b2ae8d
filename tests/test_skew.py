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
