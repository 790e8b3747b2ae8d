"""Geospatial bbox Column functions (STAC bounding boxes).

STAC documents carry ``bbox: [minx, miny, maxx, maxy]`` (WGS-84 degrees;
reference stac_format.py bbox key, tests/stac_objects.py:96-101). These
are the predicates a spatial catalog query needs — pure codegen
expressions over ``array<double>`` columns, so a bbox filter pushes into
the scan stage like any other predicate. Geometry stays GeoJSON (SURVEY
§7.3.6); full geometry predicates are an extension slot for a UDF pack.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(b: Column, i: int) -> Column:
    return F.element_at(b, i + 1)


def bbox_intersects(a: Column, b: Column) -> Column:
    """True when the two boxes share any area (touching edges count)."""
    return (
        (_c(a, 0) <= _c(b, 2))
        & (_c(b, 0) <= _c(a, 2))
        & (_c(a, 1) <= _c(b, 3))
        & (_c(b, 1) <= _c(a, 3))
    )


def bbox_contains_point(b: Column, x: Column, y: Column) -> Column:
    return (_c(b, 0) <= x) & (x <= _c(b, 2)) & (_c(b, 1) <= y) & (y <= _c(b, 3))


def bbox_area(b: Column) -> Column:
    """Degenerate boxes (inverted bounds) have zero area."""
    w = F.greatest(_c(b, 2) - _c(b, 0), F.lit(0.0))
    h = F.greatest(_c(b, 3) - _c(b, 1), F.lit(0.0))
    return w * h


def bbox_union(a: Column, b: Column) -> Column:
    """Smallest box covering both — the catalog-rollup aggregate shape
    (summary extent of a collection = union-fold over item boxes)."""
    return F.array(
        F.least(_c(a, 0), _c(b, 0)),
        F.least(_c(a, 1), _c(b, 1)),
        F.greatest(_c(a, 2), _c(b, 2)),
        F.greatest(_c(a, 3), _c(b, 3)),
    )


ZORDER_BITS = 15


def zorder_key(cell_x: Column, cell_y: Column, bits: int = ZORDER_BITS) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` of two
    non-negative cell indices (x in even positions, y in odd).

    The clustering key for spatial locality at scale: write the table
    ``sortWithinPartitions(zorder_key(...))`` / range-partitioned on the
    key and parquet row-group min/max stats turn any bbox query into
    file skipping — touching O(query area) data instead of a full scan.
    Pure integer bit arithmetic → codegen'd, and bit-identical in any
    engine."""
    terms = [
        ((cell_x.bitwiseAND(1 << i)) > 0).cast("bigint") * (1 << (2 * i))
        + ((cell_y.bitwiseAND(1 << i)) > 0).cast("bigint") * (1 << (2 * i + 1))
        for i in range(bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_key_sql(x_expr: str, y_expr: str, bits: int = ZORDER_BITS) -> str:
    """The same Morton key as ANSI SQL (for oracles / other engines)."""
    terms = " + ".join(
        f"(CASE WHEN ({x_expr}) & {1 << i} > 0 THEN {1 << (2 * i)} ELSE 0 END"
        f" + CASE WHEN ({y_expr}) & {1 << i} > 0 THEN {1 << (2 * i + 1)} ELSE 0 END)"
        for i in range(bits)
    )
    return f"({terms})"


def bbox_extent_agg(b: Column) -> list[Column]:
    """Aggregate expressions for a grouped collection extent:
    ``df.groupBy(...).agg(*bbox_extent_agg(col))`` yields
    extent_[minx,miny,maxx,maxy]."""
    return [
        F.min(_c(b, 0)).alias("extent_minx"),
        F.min(_c(b, 1)).alias("extent_miny"),
        F.max(_c(b, 2)).alias("extent_maxx"),
        F.max(_c(b, 3)).alias("extent_maxy"),
    ]
