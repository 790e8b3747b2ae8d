"""Grid-bucketed spatial join: result equals the brute-force cross join
(reference-point dedup emits each intersecting pair exactly once, incl.
multi-cell pairs), and the plan stays an equi-join — never a cross
product."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from geostore_spark.functions.geo import bbox_intersects
from geostore_spark.operators.spatial import spatial_grid_join

# boxes sized/placed to exercise: same-cell pairs, pairs spanning several
# 2° cells (must not duplicate), edge-touching, disjoint, and negative
# coordinates (floor-of-negative cells)
LEFT = [
    (1, [0.5, 0.5, 1.5, 1.5]),
    (2, [1.0, 1.0, 5.0, 5.0]),     # spans multiple cells
    (3, [-3.5, -3.5, -0.5, -0.5]),  # negative coords, spans cells
    (4, [10.0, 10.0, 11.0, 11.0]),  # isolated
]
RIGHT = [
    (10, [1.0, 1.0, 2.0, 2.0]),
    (11, [4.0, 4.0, 6.0, 6.0]),     # overlaps only box 2, across cells
    (12, [-1.0, -1.0, 0.0, 0.0]),   # touches 3's corner region
    (13, [50.0, 50.0, 51.0, 51.0]),  # disjoint from everything
]


def _pairs(spark):
    l = spark.createDataFrame(LEFT, "l_id int, bbox array<double>")
    r = spark.createDataFrame(RIGHT, "r_id int, bbox array<double>")
    return l, r


def test_grid_join_matches_bruteforce(spark):
    l, r = _pairs(spark)
    got = {
        (row["l_id"], row["r_id"])
        for row in spatial_grid_join(l, r, "l_id", "r_id").collect()
    }
    expect = {
        (row["l_id"], row["r_id"])
        for row in l.crossJoin(r.select(F.col("r_id"), F.col("bbox").alias("rb")))
        .filter(bbox_intersects(F.col("bbox"), F.col("rb")))
        .collect()
    }
    assert got == expect
    assert (2, 11) in got  # multi-cell overlap found exactly once
    assert (4, 13) not in got


def test_grid_join_emits_each_pair_once(spark):
    l, r = _pairs(spark)
    rows = spatial_grid_join(l, r, "l_id", "r_id").collect()
    pairs = [(row["l_id"], row["r_id"]) for row in rows]
    assert len(pairs) == len(set(pairs))


def test_grid_join_plan_is_equi_join(spark):
    df = entry_mod.queries()["x_geo_grid_join"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
