"""Iterative ML primitives over the ``embeddings`` table.

The reference has no ML surface; a training-data pipeline needs at least
cluster assignment (corpus curation, IVF coarse quantizers — see
``similarity.py``'s BLAS nearest-centroid path). This module implements
Lloyd's k-means as a *driver-looped sequence of DataFrame ops* — the
MLlib pattern: model state (k×dim centroids, a few KB) lives at the
driver, each iteration is one broadcast join + two codegen'd partial
aggregations over the fact table, so every pass scales with bytes
scanned and the only shuffles carry (vec, cid) and (cid, pos) rows.

Cross-engine exactness: float distance sums depend on summation order,
so a naive double implementation diverges from any oracle on near-ties.
Instead coordinates are quantized to integers (``floor(x * 1e6)``) and
ALL iterative arithmetic — distances, argmin tie-breaks, centroid
updates — is exact 64-bit integer math (the one division per update is
a single IEEE double op, identical everywhere). The unrolled DuckDB
recursive oracle reproduces every iteration bit-for-bit: a rare thing
for an iterative algorithm, and the property that makes the t2 gate
meaningful here.

At large k the exploded broadcast join degrades (k× row blowup); the
scale path for assignment is the per-partition BLAS argmin already used
by ``x_sim_ivf`` (similarity.py). k-means here demonstrates the
engine-exact integer path with small k, which is the common regime for
coarse quantizers (k ≤ a few hundred ≪ dim blowup limit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geostore_spark.registry import register
from geostore_spark.sources.tables import load_table

K = 8
ITERS = 3
QSCALE = 1_000_000  # |x| ≤ ~0.6 → xq ≤ 6e5; 64·diff² ≤ 9e13 ≪ 2^63


def quantized_coords(embeddings: DataFrame) -> DataFrame:
    """Exploded (vec_id, pos, xq) with 1-based pos and integer coords."""
    return embeddings.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("pos0", "x")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        F.floor(F.col("x").cast("double") * QSCALE).cast("bigint").alias("xq"),
    )


def kmeans_assign(
    spark: SparkSession,
    embeddings: DataFrame,
    k: int = K,
    iters: int = ITERS,
) -> DataFrame:
    """Lloyd's k-means, integer-exact. Returns (vec_id, cluster, distq)
    where cluster is the seed vec_id of the winning centroid and distq
    the quantized squared L2 distance after the final assignment.

    Seeds: the k smallest vec_ids (deterministic; k-means++ would need
    engine-specific randomness). Empty clusters drop out of the next
    round identically in every engine (groupBy only sees assigned cids).
    """
    vecs = quantized_coords(embeddings).localCheckpoint(eager=False)
    seed_ids = [
        r["vec_id"]
        for r in embeddings.select("vec_id").orderBy("vec_id").limit(k).collect()
    ]
    cent_rows = [
        (r["vec_id"], r["pos"], r["xq"])
        for r in vecs.filter(F.col("vec_id").isin(seed_ids)).collect()
    ]
    assign = None
    for it in range(iters):
        cdf = spark.createDataFrame(cent_rows, "cid long, pos int, cq long")
        diff = F.col("xq") - F.col("cq")
        dist = (
            vecs.join(F.broadcast(cdf), "pos")
            .groupBy("vec_id", "cid")
            .agg(F.sum(diff * diff).alias("distq"))
        )
        # argmin as min(struct(distq, cid)): lexicographic min == the
        # window's (distq, cid) order, but partially aggregates map-side
        # instead of sort-shuffling every (vec, cid) row
        assign = (
            dist.groupBy("vec_id")
            .agg(F.min(F.struct("distq", "cid")).alias("m"))
            .select("vec_id", F.col("m.cid").alias("cid"), F.col("m.distq").alias("distq"))
        )
        if it < iters - 1:
            # floor(sum/count): the sum is exact (bigint), the single
            # double division is IEEE-identical across engines
            new_cq = F.floor(
                F.sum("xq").cast("double") / F.count(F.lit(1))
            ).cast("bigint")
            cent_rows = [
                (r["cid"], r["pos"], r["cq"])
                for r in assign.join(vecs, "vec_id")
                .groupBy("cid", "pos")
                .agg(new_cq.alias("cq"))
                .collect()
            ]
    return assign.select("vec_id", F.col("cid").alias("cluster"), "distq")


def _kmeans_oracle(k: int = K, iters: int = ITERS) -> str:
    parts = [
        f"""v AS (
         SELECT vec_id, u.pos AS pos, u.xq AS xq FROM (
           SELECT vec_id,
                  unnest(list_transform(range(1, len(embedding) + 1),
                    i -> {{'pos': i,
                          'xq': CAST(FLOOR(CAST(embedding[i] AS DOUBLE)
                                           * CAST({QSCALE} AS DOUBLE)) AS BIGINT)}})) AS u
           FROM embeddings)
       )""",
        f"seeds AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})",
        "c0 AS (SELECT v.vec_id AS cid, pos, xq AS cq FROM v JOIN seeds USING (vec_id))",
    ]
    for it in range(iters):
        parts.append(
            f"""d{it} AS (
         SELECT v.vec_id, c.cid,
                CAST(SUM((v.xq - c.cq) * (v.xq - c.cq)) AS BIGINT) AS distq
         FROM v JOIN c{it} c ON v.pos = c.pos GROUP BY v.vec_id, c.cid
       )"""
        )
        parts.append(
            f"""a{it} AS (
         SELECT vec_id, cid, distq FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY distq, cid) AS rn
           FROM d{it}) WHERE rn = 1
       )"""
        )
        if it < iters - 1:
            parts.append(
                f"""c{it + 1} AS (
         SELECT a.cid, v.pos,
                CAST(FLOOR(CAST(SUM(v.xq) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cq
         FROM a{it} a JOIN v ON a.vec_id = v.vec_id GROUP BY a.cid, v.pos
       )"""
            )
    body = ",\n       ".join(parts)
    return f"""
       WITH {body}
       SELECT vec_id, cid AS cluster, distq
       FROM a{iters - 1} ORDER BY vec_id LIMIT 500"""


@register(
    "x_ml_kmeans",
    "Lloyd's k-means over embeddings (k=8, 3 iterations), integer-exact: "
    "quantized coords make distances, tie-breaks and centroid updates "
    "pure 64-bit integer arithmetic, so the unrolled DuckDB oracle "
    "matches an ITERATIVE algorithm bit-for-bit. Broadcast centroids, "
    "map-side partial aggregation; model state lives at the driver.",
    _kmeans_oracle(),
)
def q_kmeans(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf)
    return kmeans_assign(spark, emb).orderBy("vec_id").limit(500)
