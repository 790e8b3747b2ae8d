"""bbox function tests: intersection/containment/area/union/extent over
STAC-shaped [minx, miny, maxx, maxy] arrays, incl. antimeridian-adjacent
and degenerate boxes."""

from __future__ import annotations

from pyspark.sql import functions as F

from geostore_spark.functions.geo import (
    bbox_area,
    bbox_contains_point,
    bbox_extent_agg,
    bbox_intersects,
    bbox_union,
)

BOXES = [
    (1, [170.0, -45.0, 179.0, -34.0]),   # NZ-ish
    (2, [174.0, -42.0, 176.0, -40.0]),   # inside 1
    (3, [-10.0, 40.0, 5.0, 50.0]),       # Europe-ish, disjoint from 1
    (4, [179.0, -41.0, 180.0, -40.0]),   # touches 1's east edge
    (5, [10.0, 10.0, 10.0, 10.0]),       # degenerate point-box
]


def _df(spark):
    return spark.createDataFrame(BOXES, "id int, bbox array<double>")


def test_intersects_matrix(spark):
    df = _df(spark)
    a, b = df.alias("a"), df.alias("b")
    got = {
        (r["ia"], r["ib"]): r["x"]
        for r in a.crossJoin(b)
        .select(
            F.col("a.id").alias("ia"),
            F.col("b.id").alias("ib"),
            bbox_intersects(F.col("a.bbox"), F.col("b.bbox")).alias("x"),
        )
        .collect()
    }
    assert got[(1, 2)] and got[(2, 1)]          # containment intersects
    assert not got[(1, 3)] and not got[(3, 1)]  # disjoint
    assert got[(1, 4)]                          # edge-touching counts
    assert all(got[(i, i)] for i, _ in BOXES)   # reflexive


def test_point_containment_and_area(spark):
    row = (
        _df(spark)
        .filter(F.col("id") == 1)
        .select(
            bbox_contains_point(F.col("bbox"), F.lit(175.0), F.lit(-40.0)).alias("inside"),
            bbox_contains_point(F.col("bbox"), F.lit(0.0), F.lit(0.0)).alias("outside"),
            bbox_area(F.col("bbox")).alias("area"),
        )
        .first()
    )
    assert row["inside"] and not row["outside"]
    assert abs(row["area"] - 9.0 * 11.0) < 1e-9
    deg = _df(spark).filter(F.col("id") == 5).select(bbox_area("bbox").alias("a")).first()
    assert deg["a"] == 0.0


def test_union_and_grouped_extent(spark):
    df = _df(spark)
    pair = (
        df.filter(F.col("id").isin(1, 3))
        .agg(*bbox_extent_agg(F.col("bbox")))
        .first()
    )
    assert [pair[k] for k in ("extent_minx", "extent_miny", "extent_maxx", "extent_maxy")] == [
        -10.0, -45.0, 179.0, 50.0,
    ]
    u = (
        df.filter(F.col("id") == 1)
        .crossJoin(df.filter(F.col("id") == 3).select(F.col("bbox").alias("b2")))
        .select(bbox_union(F.col("bbox"), F.col("b2")).alias("u"))
        .first()["u"]
    )
    assert u == [-10.0, -45.0, 179.0, 50.0]
