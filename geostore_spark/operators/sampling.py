"""Deterministic sampling operators for training-data pipelines.

The reference takes no samples — it validates every asset exhaustively
(``geostore/check_files_checksums/task.py:45-69`` fans the full manifest
out to array workers). A 100 TB corpus pipeline, by contrast, constantly
needs *reproducible* subsets: eval holdouts, per-language rebalancing,
quick-look QA slices. ``rand()``-based sampling is non-reproducible
across retries and engines, so these operators derive the keep/drop
decision from a content-independent hash of the row key plus an explicit
seed string: the same row lands on the same side of the cut on every
engine, every run, every partition layout. The predicate is a pure
codegen expression evaluated at the scan — no shuffle, no state, and
Catalyst pushes the stratum filter into the parquet read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from geostore_spark.operators.dedup import _duck_md5_32, _md5_32
from geostore_spark.registry import register
from geostore_spark.sources.tables import load_table, load_table_for_compute
from geostore_spark.operators.util import local_rows_df, pin_branch_point

SEED = "geostore-sample-v1"
BUCKETS = 10_000

# per-language keep rates: downsample the dominant language, keep the
# scarce ones whole — the standard corpus-rebalancing move
LANG_RATES = {"en": 0.25, "de": 0.6, "es": 0.6, "fr": 0.6, "zh": 1.0}
DEFAULT_RATE = 0.5


def sample_bucket(key: Column, seed: str = SEED) -> Column:
    """Deterministic bucket in [0, BUCKETS) from md5(seed || key)."""
    return _md5_32(F.concat(F.lit(seed + ":"), key.cast("string"))) % BUCKETS


def stratified_sample(
    df: DataFrame,
    key: Column,
    stratum: Column,
    rates: dict[str, float],
    default_rate: float = DEFAULT_RATE,
    seed: str = SEED,
) -> DataFrame:
    """Keep each row iff its hash bucket falls under its stratum's rate.

    Exact reproducibility properties: adding/removing OTHER rows never
    changes a row's fate (no rank/quantile dependence), and raising a
    stratum's rate strictly grows the previous sample (nested samples,
    the property eval-holdout pipelines rely on)."""
    cut = F.lit(default_rate * BUCKETS)
    for value, rate in rates.items():
        cut = F.when(stratum == value, F.lit(rate * BUCKETS)).otherwise(cut)
    return df.filter(sample_bucket(key, seed) < cut)


def _sample_oracle() -> str:
    bucket = _duck_md5_32(f"'{SEED}:' || CAST(doc_id AS VARCHAR)") + f" % {BUCKETS}"
    cut = "CASE lang " + " ".join(
        f"WHEN '{v}' THEN {r * BUCKETS}" for v, r in LANG_RATES.items()
    ) + f" ELSE {DEFAULT_RATE * BUCKETS} END"
    return f"""
       WITH kept AS (
         SELECT doc_id, lang, source FROM documents WHERE {bucket} < {cut}
       )
       SELECT lang, COUNT(*) AS n_kept,
              MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
       FROM kept GROUP BY lang ORDER BY lang"""


@register(
    "x_sample_stratified",
    "Deterministic hash-stratified sampling: keep iff md5(seed||doc_id) "
    "bucket < per-language rate. Reproducible across engines/retries/"
    "partitionings (no rand()), nested under rate increases, zero "
    "shuffle — the predicate evaluates at the scan.",
    _sample_oracle(),
)
def q_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table_for_compute(spark, "documents", sf)
    kept = stratified_sample(docs, F.col("doc_id"), F.col("lang"), LANG_RATES)
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )


# -- token-budget fill -------------------------------------------------------

TOKEN_BUDGET = 2000  # per language


def token_budget_sample(
    docs: DataFrame, budget: int = TOKEN_BUDGET
) -> DataFrame:
    """Fill a per-language token budget in deterministic pseudo-random
    order (md5 of the doc id): keep each language's docs, hash-ordered,
    while the running token total stays ≤ budget — the "mix a training
    set to N tokens per language" primitive.

    Scale shape: the naive form is one cumulative-sum window per
    language — a 5-way parallelism ceiling at 100 TB. Instead the hash
    order is split into 256 buckets (first md5 byte); a tiny
    (lang, bucket) token-sum aggregate comes to the driver, a prefix
    scan there finds each language's boundary bucket, and the window
    runs only INSIDE kept buckets (≤ 1/256 of the corpus per language,
    window key = (lang, bucket)) with the bucket's base offset added
    back. Buckets wholly past the budget are filtered before the
    window — at the scan, once the broadcast rules join prunes them.
    Results are identical to the naive window by construction (bucket =
    hash prefix, so bucket order == hash order).
    """
    spark = docs.sparkSession
    toks = F.size(F.split(F.trim("text"), " "))
    okey = F.md5(F.col("doc_id").cast("string").cast("binary"))
    base = docs.select(
        "doc_id",
        "lang",
        toks.alias("toks"),
        okey.alias("okey"),
        F.conv(F.substring(okey, 1, 2), 16, 10).cast("int").alias("bucket"),
    ).transform(pin_branch_point)

    bucket_sums = base.groupBy("lang", "bucket").agg(F.sum("toks").alias("btoks"))
    rules = []  # (lang, bucket, base_acc) for buckets that can contribute
    acc: dict[str, int] = {}
    for r in sorted(bucket_sums.collect(), key=lambda r: (r["lang"], r["bucket"])):
        prior = acc.get(r["lang"], 0)
        if prior < budget:
            rules.append((r["lang"], r["bucket"], prior))
        acc[r["lang"]] = prior + r["btoks"]
    rules_df = local_rows_df(
        spark, rules, "lang string, bucket int, base_acc long"
    )

    from pyspark.sql import Window

    w = Window.partitionBy("lang", "bucket").orderBy("okey", "doc_id")
    return (
        base.join(F.broadcast(rules_df), ["lang", "bucket"])
        .withColumn("cum", F.col("base_acc") + F.sum("toks").over(w))
        .filter(F.col("cum") <= budget)
        .select("doc_id", "lang", "toks", "cum")
    )


@register(
    "x_sample_token_budget",
    "Per-language token-budget fill in deterministic hash order: bucketed "
    "prefix-scan (256 hash buckets, driver-side boundary search) so the "
    "cumulative window runs only inside kept buckets — never a per-language "
    "global window. Identical to the naive window by construction.",
    f"""WITH t AS (
         SELECT doc_id, lang,
                len(string_split(trim(text), ' ')) AS toks,
                md5(CAST(doc_id AS VARCHAR)) AS okey
         FROM documents
       ),
       c AS (
         SELECT doc_id, lang, toks,
                SUM(toks) OVER (PARTITION BY lang ORDER BY okey, doc_id) AS cum
         FROM t
       )
       SELECT doc_id, lang, toks, CAST(cum AS BIGINT) AS cum
       FROM c WHERE cum <= {TOKEN_BUDGET}
       ORDER BY lang, cum""",
)
def q_token_budget(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table_for_compute(spark, "documents", sf)
    return token_budget_sample(docs).orderBy("lang", "cum")


# -- exact-size deterministic sample ----------------------------------------

TOPK_SAMPLE_K = 100


@register(
    "x_sample_topk_hash",
    "Exact-size uniform sample without replacement: rank every row by "
    "md5(seed || key) and take the k smallest — reproducible across "
    "engines/retries/partitionings like the rate-based sampler, but with "
    "a guaranteed sample size (rate-based sampling only hits k in "
    "expectation). Physically a TakeOrdered: per-partition top-k then a "
    "k-row merge on the driver side of the exchange — never a global "
    "sort, never a count() pre-pass.",
    f"""SELECT doc_id, lang FROM (
         SELECT doc_id, lang FROM documents
         ORDER BY md5('{SEED}:' || CAST(doc_id AS VARCHAR)), doc_id
         LIMIT {TOPK_SAMPLE_K})
       ORDER BY doc_id""",
)
def q_topk_hash_sample(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table_for_compute(spark, "documents", sf)
    h = F.md5(F.concat(F.lit(SEED + ":"), F.col("doc_id").cast("string")))
    return (
        docs.select("doc_id", "lang", h.alias("h"))
        .orderBy("h", "doc_id")
        .limit(TOPK_SAMPLE_K)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


# -- sequence packing (LLM pretraining batch assembly) ----------------------

PACK_BUDGET = 512  # tokens per packed sequence
PACK_SHARDS = 16  # pack within hash shards — no global sort at scale


@register(
    "x_pipeline_pack_sequences",
    "Sequence packing for LLM pretraining: greedy contiguous bin-packing "
    "of documents into fixed token-budget sequences. Docs are sharded by "
    "a deterministic hash (so packing is per-shard and needs NO global "
    "sort — at 100 TB each shard packs independently on its own "
    "partition), ordered within the shard, and assigned "
    "seq = floor(running-pre-sum / budget). A doc longer than the budget "
    "occupies its own sequence(s). One window over the shard key is the "
    "only shuffle; the rollup reuses the same partitioning.",
    f"""WITH d AS (
         SELECT doc_id,
                CAST(doc_id % {PACK_SHARDS} AS BIGINT) AS shard,
                len(string_split(text, ' ')) AS n_tok
         FROM documents
       ),
       c AS (
         SELECT doc_id, shard, n_tok,
                COALESCE(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
         FROM d
       ),
       a AS (
         SELECT shard, pre // {PACK_BUDGET} AS seq_id, doc_id, n_tok FROM c
       )
       SELECT shard, CAST(seq_id AS BIGINT) AS seq_id,
              COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
       FROM a GROUP BY shard, seq_id
       ORDER BY shard, seq_id""",
)
def q_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table_for_compute(spark, "documents", sf)
    d = docs.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).cast("bigint").alias("shard"),
        F.size(F.split(F.col("text"), " ")).alias("n_tok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    return (
        d.withColumn("pre", pre)
        .withColumn("seq_id", F.expr(f"pre div {PACK_BUDGET}"))
        .groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
        .orderBy("shard", "seq_id")
    )


# -- training-mix rebalance planner ------------------------------------------

MIX_WEIGHTS = {"en": 0.4, "de": 0.2, "es": 0.2, "fr": 0.1, "zh": 0.1}


@register(
    "x_pipeline_mix_rebalance",
    "Training-mix rebalance planner: given per-language token inventories "
    "and target mix weights, find the largest total budget the inventory "
    "supports (min over languages of tokens/weight — the binding "
    "language keeps rate 1.0) and each language's keep rate. The plan is "
    "language-count-sized: one partial-aggregated rollup of the corpus, "
    "a 5-row weights dimension, and a 1-row binding-budget broadcast — "
    "the decision layer that drives x_sample_token_budget's executor.",
    f"""WITH inv AS (
         SELECT lang, COUNT(*) AS n_docs,
                CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
         FROM documents GROUP BY lang
       ),
       w(lang, weight) AS (VALUES {", ".join(f"('{k}', {v})" for k, v in MIX_WEIGHTS.items())}),
       iw AS (
         SELECT inv.lang, n_docs, n_tokens, weight
         FROM inv JOIN w ON inv.lang = w.lang
       ),
       budget AS (SELECT MIN(n_tokens / weight) AS t FROM iw)
       SELECT lang, n_docs, n_tokens, weight,
              CAST(FLOOR(weight * budget.t) AS BIGINT) AS target_tokens,
              ROUND(CAST(FLOOR(weight * budget.t) AS DOUBLE) / n_tokens, 4)
                AS keep_rate
       FROM iw CROSS JOIN budget ORDER BY lang""",
)
def q_mix_rebalance(spark: SparkSession, sf: str) -> DataFrame:
    # plain scan (the c4_lines re-pin precedent, r11 item 5): the
    # inventory rollup is an arithmetic-only projection with map-side
    # partials — the compute-rebalance exchange would shuffle the full
    # document text round-robin just to split+size it, costing more
    # than the row-group parallelism it buys (A/B below in
    # OPTIMIZATION_r11.md)
    docs = load_table(spark, "documents", sf)
    inv = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("bigint").alias("n_tokens"),
    )
    w = local_rows_df(
        docs.sparkSession, list(MIX_WEIGHTS.items()), "lang string, weight double"
    )
    iw = inv.join(F.broadcast(w), "lang")
    budget = iw.agg(F.min(F.col("n_tokens") / F.col("weight")).alias("t"))
    target = F.floor(F.col("weight") * F.col("t")).cast("bigint")
    return (
        iw.join(F.broadcast(budget))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "weight",
            target.alias("target_tokens"),
            F.round(target.cast("double") / F.col("n_tokens"), 4).alias("keep_rate"),
        )
        .orderBy("lang")
    )


# -- weighted priority sampling (Efraimidis-Spirakis) ------------------------

WEIGHTED_SAMPLE_K = 100


@register(
    "x_sample_weighted",
    "Weighted sampling without replacement (Efraimidis-Spirakis "
    "exponential-key form): each doc draws a deterministic uniform from "
    "md5(doc_id), its priority key is -ln(u)/w with w = token count, "
    "and the sample is the k smallest keys — longer docs "
    "proportionally likelier, reproducible across engines/retries/"
    "partitionings (no rand()). The key is a zero-shuffle scan "
    "projection and the k winners come from a TakeOrdered merge of "
    "per-partition top-k, never a global sort.",
    f"""WITH d AS (
         SELECT doc_id, len(string_split(text, ' ')) AS n_words,
                CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-es'),
                                     1, 12)) AS BIGINT)
                  / CAST(281474976710656 AS DOUBLE) AS u
         FROM documents
       )
       SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
              ROUND(-ln(u) / n_words, 8) AS key
       FROM d ORDER BY -ln(u) / n_words, doc_id LIMIT {WEIGHTED_SAMPLE_K}""",
)
def q_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table_for_compute(spark, "documents", sf)
    # 12 hex chars of the md5 = 48 uniform bits; u in (0, 1]
    u = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("-es"))), 1, 12),
        16,
        10,
    ).cast("double") / F.lit(float(1 << 48))
    n_words = F.size(F.split(F.col("text"), " "))
    key = -F.log(u) / n_words
    return (
        docs.select(
            "doc_id",
            n_words.cast("bigint").alias("n_words"),
            key.alias("_key"),
        )
        .orderBy("_key", "doc_id")
        .limit(WEIGHTED_SAMPLE_K)
        .select("doc_id", "n_words", F.round("_key", 8).alias("key"))
    )


# -- the preprocessing funnel, end to end ------------------------------------

FUNNEL_MIN_WORDS = 50  # gopher-style floor
FUNNEL_SAMPLE_PCT = 50  # final hash-stratified keep rate


@register(
    "x_pipeline_funnel",
    "The full preprocessing funnel as ONE composed plan — the pipeline "
    "report every corpus release publishes: raw inventory -> quality "
    "gate (min token floor) -> exact dedup (first doc per content "
    "digest wins) -> deterministic 50% hash sample, with doc and token "
    "counts after every stage. Stage predicates fuse into a single "
    "scan + one digest shuffle + one conditional rollup: Catalyst "
    "collapses the funnel, so adding a stage costs a predicate, not a "
    "pass.",
    f"""WITH d AS (
         SELECT doc_id, md5(text) AS digest,
                len(string_split(text, ' ')) AS n_words
         FROM documents
       ),
       q AS (SELECT * FROM d WHERE n_words >= {FUNNEL_MIN_WORDS}),
       u AS (
         SELECT *, row_number() OVER (PARTITION BY digest ORDER BY doc_id) AS rn
         FROM q
       ),
       s AS (
         SELECT *,
                CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-funnel'),
                                     1, 4)) AS INT) % 100 AS bucket
         FROM u WHERE rn = 1
       )
       SELECT (SELECT COUNT(*) FROM d) AS n_raw,
              CAST((SELECT SUM(n_words) FROM d) AS BIGINT) AS tok_raw,
              (SELECT COUNT(*) FROM q) AS n_quality,
              CAST((SELECT SUM(n_words) FROM q) AS BIGINT) AS tok_quality,
              (SELECT COUNT(*) FROM s) AS n_deduped,
              CAST((SELECT SUM(n_words) FROM s) AS BIGINT) AS tok_deduped,
              (SELECT COUNT(*) FROM s WHERE bucket < {FUNNEL_SAMPLE_PCT})
                AS n_sampled,
              CAST((SELECT SUM(n_words) FROM s
                    WHERE bucket < {FUNNEL_SAMPLE_PCT}) AS BIGINT) AS tok_sampled
       """,
)
def q_pipeline_funnel(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table_for_compute(spark, "documents", sf)
    d = docs.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("digest"),
        F.size(F.split(F.col("text"), " ")).alias("n_words"),
    )
    quality = F.col("n_words") >= FUNNEL_MIN_WORDS
    # dedup rank must elect the first QUALITY doc per digest (the oracle
    # ranks the quality CTE only): ordering quality-first makes rn=1 land
    # on the smallest-id quality doc whenever one exists, without a
    # second pass over a filtered frame. Digest cardinality ~= doc
    # count, so the window partitions by a high-cardinality key — no
    # rank ceiling.
    rn = F.row_number().over(
        Window.partitionBy("digest").orderBy(F.col("q").desc(), "doc_id")
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("-funnel"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("int")
        % 100
    )
    staged = (
        d.withColumn("q", quality)
        .withColumn("rn", rn)
        .withColumn("kept", F.col("q") & (F.col("rn") == 1))
        .withColumn("sampled", F.col("kept") & (bucket < FUNNEL_SAMPLE_PCT))
    )
    return staged.agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum("n_words").cast("bigint").alias("tok_raw"),
        F.sum(F.col("q").cast("long")).alias("n_quality"),
        F.sum(F.when(F.col("q"), F.col("n_words"))).cast("bigint").alias("tok_quality"),
        F.sum(F.coalesce(F.col("kept"), F.lit(False)).cast("long")).alias("n_deduped"),
        F.sum(F.when(F.col("kept"), F.col("n_words"))).cast("bigint").alias("tok_deduped"),
        F.sum(F.coalesce(F.col("sampled"), F.lit(False)).cast("long")).alias("n_sampled"),
        F.sum(F.when(F.col("sampled"), F.col("n_words"))).cast("bigint").alias("tok_sampled"),
    )


# -- training-shard assignment ----------------------------------------------

N_SHARDS = 16


@register(
    "x_pipeline_shard_assign",
    "Deterministic training-shard assignment + balance audit: every "
    "document lands in one of 16 shards by content-independent "
    "md5(seed||doc_id) — reproducible across engines, retries and "
    "partition layouts (the property a resumable 100 TB export needs; "
    "doc_id%N would inherit id-assignment skew). One partial-aggregated "
    "shuffle to per-shard stats; the per-shard char share exposes "
    "imbalance before the expensive write fans out. At scale this IS "
    "the repartition key: shards map 1:1 to output files, so a "
    "balanced hash here means no straggler writer.",
    f"""WITH s AS (
         SELECT {_duck_md5_32("'shard:' || CAST(doc_id AS VARCHAR)")}
                  % {N_SHARDS} AS shard,
                doc_id, n_chars
         FROM documents
       ),
       tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS total_chars FROM s)
       SELECT s.shard, COUNT(*) AS n_docs,
              CAST(SUM(s.n_chars) AS BIGINT) AS sum_chars,
              MIN(s.doc_id) AS min_doc, MAX(s.doc_id) AS max_doc,
              CAST(SUM(s.n_chars) AS DOUBLE) / ANY_VALUE(tot.total_chars)
                AS char_share
       FROM s CROSS JOIN tot
       GROUP BY s.shard ORDER BY s.shard""",
)
def q_shard_assign(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table_for_compute(spark, "documents", sf)
    shard = (
        _md5_32(F.concat(F.lit("shard:"), F.col("doc_id").cast("string")))
        % N_SHARDS
    )
    s = docs.select(shard.alias("shard"), "doc_id", "n_chars")
    per = s.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )
    tot = per.agg(F.sum("sum_chars").cast("bigint").alias("total_chars"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "shard",
            "n_docs",
            "sum_chars",
            "min_doc",
            "max_doc",
            (F.col("sum_chars").cast("double") / F.col("total_chars")).alias(
                "char_share"
            ),
        )
        .orderBy("shard")
    )


# -- temperature-scaled language mix -----------------------------------------

MIX_ALPHA_NUM, MIX_ALPHA_DEN = 3, 10  # alpha = 0.3, the mT5 default
MIX_SCALE = 1_000_000_000


@register(
    "x_pipeline_mix_temperature",
    "Temperature-scaled sampling weights per language (w_l ∝ p_l^0.3, "
    "the mT5/multilingual-pretraining default): upweights scarce "
    "languages without letting any dominate. One corpus rollup to "
    "per-language token counts (map-side partials); the power/normalize "
    "math runs on the language-count-sized aggregate — the corpus is "
    "read once and never shuffled beyond the rollup. The normalizer "
    "sums integer-quantized powered shares (exact, order-free), so "
    "every weight is deterministic across engines.",
    f"""WITH l AS (
         SELECT lang,
                CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
                  AS toks
         FROM documents GROUP BY lang
       ),
       tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS t FROM l),
       p AS (
         SELECT lang, toks,
                CAST(round(pow(CAST(toks AS DOUBLE) / tot.t,
                               {MIX_ALPHA_NUM}.0 / {MIX_ALPHA_DEN})
                           * {MIX_SCALE}) AS BIGINT) AS pw_q
         FROM l CROSS JOIN tot
       ),
       z AS (SELECT CAST(SUM(pw_q) AS BIGINT) AS z FROM p)
       SELECT p.lang, p.toks,
              CAST(p.pw_q AS DOUBLE) / {MIX_SCALE} AS powered_share,
              CAST(p.pw_q AS DOUBLE) / z.z AS sample_weight
       FROM p CROSS JOIN z ORDER BY p.lang""",
)
def q_mix_temperature(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table_for_compute(spark, "documents", sf)
    toks = F.size(F.split(F.trim("text"), r"\s+"))
    lang = docs.groupBy("lang").agg(F.sum(toks).cast("bigint").alias("toks"))
    lang = lang.transform(pin_branch_point)
    tot = lang.agg(F.sum("toks").cast("bigint").alias("t"))
    p = lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "toks",
        F.round(
            F.pow(
                F.col("toks").cast("double") / F.col("t"),
                MIX_ALPHA_NUM / MIX_ALPHA_DEN,
            )
            * MIX_SCALE,
            0,
        )
        .cast("bigint")
        .alias("pw_q"),
    )
    p = p.transform(pin_branch_point)
    z = p.agg(F.sum("pw_q").cast("bigint").alias("z"))
    return (
        p.crossJoin(F.broadcast(z))
        .select(
            "lang",
            "toks",
            (F.col("pw_q").cast("double") / MIX_SCALE).alias("powered_share"),
            (F.col("pw_q").cast("double") / F.col("z")).alias("sample_weight"),
        )
        .orderBy("lang")
    )
