"""Connected components vs a Python union-find over the same edges."""

from __future__ import annotations

from pyspark.sql import functions as F

from geostore_spark.operators.graph import connected_components

# chain 1-2-3-4 (diameter 3, forces multi-round propagation),
# triangle 10-11-12 plus pendant 13, isolated pair 20-21
EDGES = [
    (2, 1),
    (2, 3),
    (4, 3),
    (10, 11),
    (11, 12),
    (10, 12),
    (12, 13),
    (20, 21),
]


def _union_find() -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in EDGES:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def test_connected_components_match_union_find(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r["v"]: r["label"]
        for r in connected_components(edges, "src", "dst").collect()
    }
    assert got == _union_find()
    # the chain's far end reached the minimum despite no direct edge
    assert got[4] == 1 and got[13] == 10


def test_connected_components_converges_on_single_edge(spark):
    edges = spark.createDataFrame([(7, 5)], "src long, dst long")
    rows = connected_components(edges, "src", "dst").orderBy("v").collect()
    assert [(r["v"], r["label"]) for r in rows] == [(5, 5), (7, 5)]
