"""Embedding-column storage operators.

A 100 TB embedding corpus is dominated by vector bytes; symmetric int8
quantization (the faiss `SQ8` / product-serving standard) cuts storage
and scan bandwidth 4× versus float32 at negligible recall cost. This
operator computes the per-vector scale (max |x|) and the quantized
codes entirely with per-row expressions — at scale it is a single
scan-project pass with no shuffle at all.

Cross-engine determinism: the code array is digested into integer
scalars (saturation count, sum, sum of squares) rather than emitted as
an array column; every digest is exact 64-bit integer math, and the one
float output (the scale) is a deterministic per-row max. ROUND(x) to an
integer compares "fraction ≥ .5" on the exact binary double in both
engines (unlike ROUND(x, d), which diverges at decimal midpoints — see
x_text_quality's note), so the codes match bit-for-bit.

The reference stores only opaque assets (geostore/s3.py); embedding
awareness is a north-star extension (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geostore_spark.registry import register
from geostore_spark.sources.tables import load_table


@register(
    "x_emb_quantize",
    "Symmetric int8 quantization of embeddings: per-vector max-|x| scale, "
    "codes round(x*127/scale), digested to exact integer scalars "
    "(saturation count / sum / sum-of-squares). Pure per-row expressions — "
    "a zero-shuffle scan-project pass at any scale.",
    """SELECT vec_id,
              list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
                AS max_abs,
              len(list_filter(q, c -> abs(c) = 127)) AS n_sat,
              CAST(list_sum(q) AS BIGINT) AS sum_q,
              CAST(list_sum(list_transform(q, c -> c * c)) AS BIGINT) AS sum_q2
       FROM (
         SELECT vec_id, embedding,
                list_transform(embedding,
                  x -> CAST(round(CAST(x AS DOUBLE) * 127 / nullif(
                         list_max(list_transform(embedding,
                                                 y -> abs(CAST(y AS DOUBLE)))), 0))
                       AS BIGINT)) AS q
         FROM embeddings)
       ORDER BY vec_id LIMIT 500""",
)
def emb_quantize(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf)
    max_abs = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    with_m = emb.select("vec_id", "embedding", max_abs.alias("max_abs"))
    q = F.transform(
        "embedding",
        lambda x: F.round(
            x.cast("double") * 127 / F.nullif(F.col("max_abs"), F.lit(0.0)), 0
        ).cast("bigint"),
    )
    with_q = with_m.select("vec_id", "max_abs", q.alias("q"))
    return (
        with_q.select(
            "vec_id",
            "max_abs",
            F.size(F.filter("q", lambda c: F.abs(c) == 127)).alias("n_sat"),
            F.aggregate("q", F.lit(0).cast("bigint"), lambda a, c: a + c).alias("sum_q"),
            F.aggregate(
                "q", F.lit(0).cast("bigint"), lambda a, c: a + c * c
            ).alias("sum_q2"),
        )
        .orderBy("vec_id")
        .limit(500)
    )
