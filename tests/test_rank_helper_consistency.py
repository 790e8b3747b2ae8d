"""Regression pin for the round-5 range-boundary consistency bug: the
two-phase rank/prefix-sum helpers feed TWO consumers (local ranks and
the offset table) from one repartitionByRange. Unpinned, each consumer
compiles its own RangePartitioning exchange, and over an
order-nondeterministic upstream (any shuffle output) the two boundary
SAMPLINGS can differ — broadcast offsets then disagree with the pids
the local ranks saw, silently corrupting ranks (observed as a +142-row
rank drift on a 60 k-row rollup). The helpers now localCheckpoint-pin
the ranged table; these tests drive them through a shuffle-producing
upstream several times and assert exact global ranks / prefix sums."""

from __future__ import annotations

from pyspark.sql import functions as F

from geostore_spark.operators.util import (
    distributed_prefix_sum,
    distributed_row_number,
)


def _nondeterministic_rollup(spark, n=50_000):
    # groupBy output order is not deterministic across evaluations —
    # exactly the upstream shape that triggered the original bug
    base = spark.range(n).select(
        (F.xxhash64("id") % 997).alias("g"),
        (F.xxhash64("id", F.lit(1)) % 10_000_000).alias("v"),
    )
    return base.groupBy("v").agg(
        F.count(F.lit(1)).alias("cnt"), F.min("g").alias("g")
    )


def test_distributed_row_number_is_exact_over_shuffle_upstream(spark):
    for _ in range(3):
        r = _nondeterministic_rollup(spark)
        ranked, counts = distributed_row_number(r, [], ["v"], "rn")
        pdf = ranked.select("v", "rn").toPandas().sort_values("v")
        assert list(pdf["rn"]) == list(range(1, len(pdf) + 1))
        assert counts.collect()[0]["_n"] == len(pdf)


def test_distributed_prefix_sum_is_exact_over_shuffle_upstream(spark):
    for _ in range(3):
        r = _nondeterministic_rollup(spark)
        c = distributed_prefix_sum(r, [], ["v"], "cnt", out_name="cum")
        pdf = c.select("v", "cnt", "cum").toPandas().sort_values("v")
        assert list(pdf["cum"]) == list(pdf["cnt"].cumsum())
