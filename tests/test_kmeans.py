"""k-means on a planted two-cluster dataset: assignment must recover the
plant, repeated runs must agree exactly (integer arithmetic throughout)."""

from __future__ import annotations

from geostore_spark.operators.ml import kmeans_assign

# two tight blobs; vec 0 and vec 1 (the two seeds for k=2) land in
# different blobs so Lloyd's converges to the plant in one round
BLOB_A = [(0, [0.1, 0.2]), (2, [0.12, 0.18]), (4, [0.09, 0.22]), (6, [0.11, 0.19])]
BLOB_B = [(1, [0.9, 0.8]), (3, [0.88, 0.82]), (5, [0.91, 0.79]), (7, [0.89, 0.81])]


def _df(spark):
    rows = [(i, [float(x) for x in v]) for i, v in BLOB_A + BLOB_B]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_recovers_planted_clusters(spark):
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(spark, _df(spark), k=2, iters=3).collect()
    }
    assert {got[i] for i, _ in BLOB_A} == {0}
    assert {got[i] for i, _ in BLOB_B} == {1}


def test_kmeans_is_deterministic(spark):
    a = sorted(
        (r["vec_id"], r["cluster"], r["distq"])
        for r in kmeans_assign(spark, _df(spark), k=2, iters=2).collect()
    )
    b = sorted(
        (r["vec_id"], r["cluster"], r["distq"])
        for r in kmeans_assign(spark, _df(spark), k=2, iters=2).collect()
    )
    assert a == b
