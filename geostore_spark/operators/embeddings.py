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
from geostore_spark.operators.util import (
    limb_sum_aggs,
    limb_total_expr,
    pin_branch_point,
    quantize_signed,
)


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


# -- distributed Gram matrix (the PCA building block) ------------------------

GRAM_DIMS = 16  # upper-triangle output: 136 cells
GRAM_SCALE = 1024  # |x| < 1 in the fixtures; q = round(x*1024) is lossless-ish


def _gram_pairs() -> list[tuple[int, int]]:
    return [(i, j) for i in range(1, GRAM_DIMS + 1) for j in range(i, GRAM_DIMS + 1)]


@register(
    "x_emb_gram",
    "Distributed Gram / scatter matrix over the first 16 embedding "
    "dimensions — THE communication pattern behind distributed PCA and "
    "whitening: the N x d data never moves, only d(d+1)/2 scalar "
    "accumulators do. All 136 moments accumulate in ONE "
    "partially-aggregated reduce over codegen expressions (map-side "
    "partials shrink every partition to 136 numbers; the shuffle "
    "carries partitions x 136 scalars, independent of N). Elements "
    "quantize to round(x*1024) BIGINTs so sums are exact and "
    "order-free; with |x| <= 1 every product is < 2^20, so BIGINT "
    "accumulation holds beyond 1e12 rows (the oracle uses HUGEINT "
    "for headroom). The d x d result is driver-eigensolve-sized — the "
    "constant-size collect contract every iterative-ML operator here "
    "follows.",
    f"""WITH q AS (
         SELECT list_transform(embedding,
                  x -> CAST(round(CAST(x AS DOUBLE) * {GRAM_SCALE}) AS BIGINT))
                AS v
         FROM embeddings
       ),
       s AS (
         SELECT COUNT(*) AS n,
                {", ".join(
                    f"SUM(CAST(v[{i}] AS HUGEINT) * v[{j}]) AS g_{i}_{j}"
                    for i in range(1, GRAM_DIMS + 1)
                    for j in range(i, GRAM_DIMS + 1)
                )}
         FROM q
       ),
       cells(i, j, g) AS (
         {" UNION ALL ".join(
             f"SELECT {i}, {j}, (SELECT g_{i}_{j} FROM s)"
             for i in range(1, GRAM_DIMS + 1)
             for j in range(i, GRAM_DIMS + 1)
         )}
       )
       SELECT i, j, CAST(g AS BIGINT) AS gram_q,
              CAST(g AS DOUBLE) / ((SELECT n FROM s)
                * {GRAM_SCALE}.0 * {GRAM_SCALE}) AS gram
       FROM cells ORDER BY i, j""",
)
def emb_gram(spark: SparkSession, sf: str) -> DataFrame:
    # expressions are generated as SQL STRINGS, not Column chains: 137
    # aggregates + 136 output cells as Column objects cost ~2500 py4j
    # round trips (~4 s of pure driver chatter per call, measured);
    # as two selectExpr calls the whole plan builds in ~50 ms
    emb = load_table(spark, "embeddings", sf)
    pairs = _gram_pairs()
    # 16 per-dim codegen projections instead of a transform() lambda
    # over the WHOLE array: Spark evaluates higher-order lambdas
    # interpreted (CodegenFallback), the lambda's round() added a
    # per-element BigDecimal, and the old form quantized every
    # dimension when only GRAM_DIMS are read. quantize_signed is
    # value-identical to round() for the sign-mixed values (r11
    # fisher_ratio lever; sf1 interleaved medians in
    # OPTIMIZATION_r11.md).
    q = emb.select(
        *[
            quantize_signed(
                F.element_at("embedding", i).cast("double"), GRAM_SCALE
            ).alias(f"v{i}")
            for i in range(1, GRAM_DIMS + 1)
        ]
    )
    s = q.selectExpr(
        "count(1) as n",
        *[f"sum(v{i} * v{j}) as g_{i}_{j}" for i, j in pairs],
    )
    denom = f"(cast(n as double) * {GRAM_SCALE} * {GRAM_SCALE})"
    cells = ", ".join(
        f"struct({i} as i, {j} as j, cast(g_{i}_{j} as bigint) as gram_q,"
        f" cast(g_{i}_{j} as double) / {denom} as gram)"
        for i, j in pairs
    )
    return (
        s.selectExpr(f"inline(array({cells}))")
        .orderBy("i", "j")
    )


def pca_top_component(spark: SparkSession, sf: str, iters: int = 20):
    """Driver-composed power iteration on the collected Gram matrix: the
    distributed pass is the single-shuffle Gram above (data never
    moves); the eigensolve runs on the d x d driver-side array —
    constant work, like the k-means centroid update. Returns
    (eigenvalue, eigenvector) for the top principal direction of the
    first GRAM_DIMS dimensions."""
    import numpy as np

    rows = emb_gram(spark, sf).collect()
    d = GRAM_DIMS
    g = np.zeros((d, d))
    for r in rows:
        g[r["i"] - 1, r["j"] - 1] = r["gram"]
        g[r["j"] - 1, r["i"] - 1] = r["gram"]
    v = np.ones(d) / d**0.5
    for _ in range(iters):
        w = g @ v
        v = w / np.linalg.norm(w)
    return float(v @ g @ v), v


# -- embedding-space outliers (diagonal Mahalanobis) -------------------------

OUTLIER_TOP = 25
OUT_SCALE = 1024


@register(
    "x_emb_outliers",
    "Embedding-space outlier screen: per-vector diagonal Mahalanobis "
    "distance (squared deviation from the corpus mean, normalized by "
    "per-dimension variance) over the first 16 dims, top-25 most "
    "anomalous — the curation pass that surfaces mis-embedded or "
    "out-of-distribution documents before training. Two passes: a "
    "64-scalar moment aggregate (map-side partials), then a "
    "zero-join scan where the broadcast moments score every vector "
    "with a higher-order fold; ranking is an integer-quantized "
    "TakeOrdered. All moments exact quantized BIGINTs.",
    f"""WITH q AS (
         SELECT vec_id,
                list_transform(embedding[1:16],
                  x -> CAST(round(CAST(x AS DOUBLE) * {OUT_SCALE}) AS BIGINT))
                  AS v
         FROM embeddings
       ),
       m AS (
         SELECT COUNT(*) AS n,
                {", ".join(
                    f"SUM(v[{i}]) AS s_{i}, SUM(CAST(v[{i}] AS HUGEINT) * v[{i}]) AS ss_{i}"
                    for i in range(1, 17)
                )}
         FROM q
       ),
       scored AS (
         SELECT q.vec_id,
                CAST(round(({" + ".join(
                    f'''pow(CAST(q.v[{i}] AS DOUBLE) - CAST(m.s_{i} AS DOUBLE) / m.n, 2)
                        / nullif(CAST(m.ss_{i} AS DOUBLE) / m.n
                                 - pow(CAST(m.s_{i} AS DOUBLE) / m.n, 2), 0)'''
                    for i in range(1, 17)
                )}) * 1000000) AS BIGINT) AS d2_q
         FROM q CROSS JOIN m
       )
       SELECT vec_id, CAST(d2_q AS DOUBLE) / 1000000 AS mahalanobis2
       FROM scored ORDER BY d2_q DESC, vec_id LIMIT {OUTLIER_TOP}""",
)
def emb_outliers(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf)
    q = emb.selectExpr(
        "vec_id",
        f"transform(slice(embedding, 1, 16),"
        f" x -> cast(round(cast(x as double) * {OUT_SCALE}) as bigint)) as v",
    )
    moment_exprs = ["count(1) as n"]
    for i in range(1, 17):
        moment_exprs.append(f"sum(element_at(v, {i})) as s_{i}")
        moment_exprs.append(
            f"sum(cast(element_at(v, {i}) as decimal(19,0)) * element_at(v, {i}))"
            f" as ss_{i}"
        )
    m = q.selectExpr(*moment_exprs)
    d2 = " + ".join(
        f"pow(cast(element_at(v, {i}) as double) - cast(s_{i} as double) / n, 2)"
        f" / nullif(cast(ss_{i} as double) / n"
        f"          - pow(cast(s_{i} as double) / n, 2), 0)"
        for i in range(1, 17)
    )
    scored = q.crossJoin(F.broadcast(m)).selectExpr(
        "vec_id", f"cast(round(({d2}) * 1000000) as bigint) as d2_q"
    )
    return (
        scored.orderBy(F.desc("d2_q"), "vec_id")
        .limit(OUTLIER_TOP)
        .selectExpr("vec_id", "cast(d2_q as double) / 1000000 as mahalanobis2")
    )


# -- Fisher discriminant ratio (class separation) ----------------------------

FISHER_DIMS = 16


@register(
    "x_emb_fisher_ratio",
    "Per-dimension Fisher discriminant ratio of the embedding space — "
    "between-class scatter over within-class scatter (the LDA "
    "criterion): dimensions with high ratios carry the label signal, "
    "near-zero ones are noise — the feature-selection companion to "
    "x_sim_label_purity's neighborhood view. One exploded "
    "(label, dim) shuffle to exact quantized moment sums (map-side "
    "partials); the scatter algebra runs on the classes x dims "
    "aggregate, never the vectors.",
    f"""WITH q AS (
         SELECT label, t.i AS dim,
                CAST(round(CAST(embedding[t.i] AS DOUBLE) * 1024) AS BIGINT) AS v
         FROM embeddings
              CROSS JOIN (SELECT unnest(range(1, {FISHER_DIMS + 1})) AS i) t
       ),
       cls AS (
         SELECT label, dim, COUNT(*) AS n,
                CAST(SUM(v) AS BIGINT) AS s,
                CAST(SUM(CAST(v AS HUGEINT) * v) AS BIGINT) AS ss
         FROM q GROUP BY label, dim
       ),
       tot AS (
         SELECT dim, CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(s) AS BIGINT) AS st
         FROM cls GROUP BY dim
       ),
       parts AS (
         SELECT cls.dim,
                cls.n * pow(CAST(cls.s AS DOUBLE) / cls.n
                            - CAST(tot.st AS DOUBLE) / tot.nt, 2) AS btwn,
                CAST(cls.ss AS DOUBLE)
                  - CAST(cls.s AS DOUBLE) * cls.s / cls.n AS wthn
         FROM cls JOIN tot ON cls.dim = tot.dim
       )
       SELECT CAST(dim AS INT) AS dim,
              CAST(round(SUM(btwn)) AS BIGINT) AS between_q,
              CAST(round(SUM(wthn)) AS BIGINT) AS within_q,
              CAST(round(SUM(btwn)) AS DOUBLE)
                / nullif(CAST(round(SUM(wthn)) AS DOUBLE), 0) AS fisher_ratio
       FROM parts GROUP BY dim ORDER BY dim""",
)
def emb_fisher_ratio(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf)
    # posexplode + codegen quantization instead of an explode over a
    # higher-order transform lambda: Spark evaluates lambda expressions
    # interpreted (CodegenFallback — the minhash finding), and the
    # lambda's round() added a per-value BigDecimal on top.
    # quantize_signed is value-identical to round() for the sign-mixed
    # embedding values; Σv² accumulates split-limb (cov_matrix/gini
    # lever) instead of through DECIMAL buffers.
    q = emb.select(
        "label",
        F.posexplode(F.slice("embedding", 1, FISHER_DIMS)).alias("dim0", "e"),
    ).select(
        "label",
        (F.col("dim0") + 1).alias("dim"),
        quantize_signed(F.col("e").cast("double"), 1024).alias("v"),
    )
    cls = q.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("bigint").alias("s"),
        *limb_sum_aggs("v * v", "vv"),
    ).selectExpr(
        "label",
        "dim",
        "n",
        "s",
        f"cast({limb_total_expr('vv')} as bigint) as ss",
    )
    cls = cls.transform(pin_branch_point)
    tot = cls.groupBy("dim").agg(
        F.sum("n").cast("bigint").alias("nt"), F.sum("s").cast("bigint").alias("st")
    )
    j = cls.join(F.broadcast(tot), "dim")
    mu_c = F.col("s").cast("double") / F.col("n")
    mu = F.col("st").cast("double") / F.col("nt")
    between = F.col("n") * F.pow(mu_c - mu, 2.0)
    within = F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n")
    parts = j.select("dim", between.alias("b"), within.alias("w"))
    bq = F.round(F.sum("b"), 0).cast("bigint")
    wq = F.round(F.sum("w"), 0).cast("bigint")
    return (
        parts.groupBy("dim")
        .agg(
            bq.alias("between_q"),
            wq.alias("within_q"),
            (bq.cast("double") / F.nullif(wq.cast("double"), F.lit(0.0))).alias(
                "fisher_ratio"
            ),
        )
        .select(F.col("dim").cast("int").alias("dim"), "between_q", "within_q", "fisher_ratio")
        .orderBy("dim")
    )


# -- matryoshka truncation audit ---------------------------------------------

TRUNC_HEAD = 8  # keep the first 8 dims
TRUNC_SCALE = 1024


@register(
    "x_emb_dim_truncation",
    "Matryoshka-style truncation audit: what fraction of each vector's "
    f"energy (squared L2 norm) lives in the first {TRUNC_HEAD} "
    "dimensions — the go/no-go measurement before storing truncated "
    "embeddings for cheap ANN pre-ranking. Per-vector ratios quantize "
    "to 1e-6 by integer floor-division over round(x*1024) coords "
    "(head <= total, both < 2^31 per vector, head * 1e6 < 2^51 — all "
    "exact int64), so the per-label rollup is order-free exact "
    "arithmetic. Zero shuffles beyond one partially-aggregated "
    "groupBy(label); the data never moves.",
    f"""WITH q AS (
         SELECT label,
                list_transform(embedding,
                  x -> CAST(round(CAST(x AS DOUBLE) * {TRUNC_SCALE}) AS BIGINT))
                  AS v
         FROM embeddings
       ),
       e AS (
         SELECT label,
                list_sum(list_transform(v[1:{TRUNC_HEAD}], x -> x * x)) AS head,
                list_sum(list_transform(v, x -> x * x)) AS tot
         FROM q
       ),
       r AS (
         SELECT label,
                CASE WHEN tot = 0 THEN 0
                     ELSE (head * 1000000) // tot END AS ratio_q6
         FROM e
       )
       SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n,
              CAST(SUM(ratio_q6) AS BIGINT) AS sum_ratio_q6,
              ROUND(SUM(ratio_q6) / (COUNT(*) * 1000000.0), 6)
                AS avg_head_energy
       FROM r GROUP BY label ORDER BY label""",
)
def emb_dim_truncation(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf)
    v = F.expr(
        f"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {TRUNC_SCALE}) AS BIGINT))"
    )
    e = emb.select("label", v.alias("v")).select(
        "label",
        F.expr(
            f"aggregate(slice(v, 1, {TRUNC_HEAD}), 0L, (a, x) -> a + x * x)"
        ).alias("head"),
        F.expr("aggregate(v, 0L, (a, x) -> a + x * x)").alias("tot"),
    )
    ratio = F.when(F.col("tot") == 0, F.lit(0)).otherwise(
        F.expr("head * 1000000 div tot")
    )
    return (
        e.select("label", ratio.alias("ratio_q6"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("ratio_q6").cast("bigint").alias("sum_ratio_q6"),
        )
        .select(
            F.col("label").cast("bigint").alias("label"),
            "n",
            "sum_ratio_q6",
            F.round(F.col("sum_ratio_q6") / (F.col("n") * 1000000.0), 6).alias(
                "avg_head_energy"
            ),
        )
        .orderBy("label")
    )


# -- centroid drift between corpus halves ------------------------------------

SHIFT_DIMS = 16
SHIFT_SCALE = 1024


@register(
    "x_emb_centroid_shift",
    "Train/serve drift screen: per-label centroid shift between two "
    "corpus halves (vec_id parity stands in for a time split) over the "
    f"first {SHIFT_DIMS} dimensions. Each half-centroid coordinate is "
    "an exact integer floor-division of quantized sums, the squared "
    "shift distance is pure int64 arithmetic, so the per-label output "
    "is order-free exact. One exploded (label, half, dim) moment "
    "shuffle with map-side partials; output is labels x 1 rows.",
    f"""WITH q AS (
         SELECT label, vec_id % 2 AS half,
                u.i AS dim,
                CAST(round(CAST(embedding[u.i] AS DOUBLE) * {SHIFT_SCALE})
                     AS BIGINT) AS xq
         FROM embeddings, (SELECT unnest(range(1, {SHIFT_DIMS} + 1)) AS i) u
       ),
       c AS (
         SELECT label, half, dim,
                CAST(SUM(xq) AS BIGINT) AS s, COUNT(*) AS n
         FROM q GROUP BY label, half, dim
       ),
       m AS (
         SELECT a.label, a.dim,
                (a.s * 1000000) // a.n AS m0,
                (b.s * 1000000) // b.n AS m1
         FROM c a JOIN c b
           ON a.label = b.label AND a.dim = b.dim
          AND a.half = 0 AND b.half = 1
       )
       SELECT CAST(label AS BIGINT) AS label,
              CAST(SUM((m0 - m1) * (m0 - m1)) AS BIGINT) AS shift_sq_q,
              ROUND(sqrt(CAST(SUM((m0 - m1) * (m0 - m1)) AS DOUBLE))
                    / ({SHIFT_SCALE} * 1000000.0), 6) AS shift_l2
       FROM m GROUP BY label ORDER BY label""",
)
def emb_centroid_shift(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf)
    q = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(F.slice("embedding", 1, SHIFT_DIMS)).alias("dim0", "x"),
    ).select(
        "label",
        "half",
        (F.col("dim0") + 1).alias("dim"),
        F.round(F.col("x").cast("double") * SHIFT_SCALE, 0).cast("bigint").alias("xq"),
    )
    c = q.groupBy("label", "half", "dim").agg(
        F.sum("xq").cast("bigint").alias("s"), F.count(F.lit(1)).alias("n")
    )
    a = c.filter(F.col("half") == 0).select(
        "label", "dim", F.expr("s * 1000000 div n").alias("m0")
    )
    b = c.filter(F.col("half") == 1).select(
        "label", "dim", F.expr("s * 1000000 div n").alias("m1")
    )
    d2 = (F.col("m0") - F.col("m1")) * (F.col("m0") - F.col("m1"))
    return (
        a.join(b, ["label", "dim"])
        .groupBy("label")
        .agg(F.sum(d2).cast("bigint").alias("shift_sq_q"))
        .select(
            F.col("label").cast("bigint").alias("label"),
            "shift_sq_q",
            F.round(
                F.sqrt(F.col("shift_sq_q").cast("double"))
                / (SHIFT_SCALE * 1000000.0),
                6,
            ).alias("shift_l2"),
        )
        .orderBy("label")
    )
