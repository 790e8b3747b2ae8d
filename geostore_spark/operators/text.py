"""Text-analysis operators over the ``documents`` table.

Language-ID (stopword lexicon), quality scoring, token counting, and
document fingerprinting. All JVM-side built-ins — no Python UDFs — so they
run inside whole-stage codegen and scale linearly with the corpus.

The reference has no text analytics; these extend its data-lake semantics
to the training-data-pipeline north star (BASELINE.json). The lexicon join
is an explicit broadcast: a dimension of dozens of rows never justifies
shuffling a 100 TB fact side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from geostore_spark.logging_keys import LOG_MESSAGE_STRATEGY_DISPATCH, log_event
from geostore_spark.registry import register
from geostore_spark.sources.tables import load_table, load_table_for_compute
from geostore_spark.operators.util import pin_branch_point, quantize

# Tiny per-language stopword lexicon (public common stopwords).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "fr": ("le", "la", "de", "et", "est", "un", "une", "dans", "pour", "que"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "不", "人", "这"),
}

_BPE_PATTERN = "[a-z]+|[0-9]|[^a-z0-9 ]"


@register(
    "x_text_tokens",
    "Token counting: whitespace tokens + a BPE-ish regex token count. "
    "North-star text analysis; pure codegen expressions.",
    f"""SELECT doc_id,
              len(string_split_regex(trim(text), '\\s+')) AS ws_tokens,
              len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS bpe_tokens
       FROM documents ORDER BY doc_id LIMIT 200""",
)
def text_tokens(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table_for_compute(spark, "documents", sf)
        .select(
            "doc_id",
            F.size(F.split(F.trim("text"), r"\s+")).alias("ws_tokens"),
            F.size(F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0)).alias("bpe_tokens"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


@register(
    "x_text_quality",
    "Quality scoring: token count, mean word length, punctuation ratio "
    "composed into a [0,1] score. North-star text analysis.",
    # No explicit ROUND: these are deterministic per-row IEEE expressions, so
    # both engines produce bit-identical doubles; the harness's uniform 4-dp
    # normalization compares them. (An explicit ROUND diverges at decimal
    # midpoints: Spark rounds via BigDecimal HALF_UP on the exact binary
    # value, DuckDB via double multiply — 0.86875 → 0.8687 vs 0.8688.)
    """SELECT doc_id,
              LEAST(n_tok/50.0, 1.0)*0.6 + LEAST(awl/8.0, 1.0)*0.3
                    + (1.0 - pr)*0.1 AS quality
       FROM (SELECT doc_id,
                    len(string_split_regex(trim(text), '\\s+')) AS n_tok,
                    length(replace(text, ' ', ''))
                      / len(string_split_regex(trim(text), '\\s+')) AS awl,
                    len(regexp_extract_all(text, '[^a-z0-9 ]'))
                      / length(text) AS pr
             FROM documents)
       ORDER BY doc_id LIMIT 200""",
)
def text_quality(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table_for_compute(spark, "documents", sf)
    return (
        docs.select("doc_id", quality_expr().alias("quality"))
        .orderBy("doc_id")
        .limit(200)
    )


def quality_expr() -> Column:
    """The composite [0,1] quality score over a ``text`` column — shared
    by the standalone scoring query and the pipeline composition."""
    n_tok = F.size(F.split(F.trim("text"), r"\s+"))
    awl = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) / n_tok
    pr = F.size(F.regexp_extract_all("text", F.lit("[^a-z0-9 ]"), 0)) / F.length("text")
    return (
        F.least(n_tok / 50.0, F.lit(1.0)) * 0.6
        + F.least(awl / 8.0, F.lit(1.0)) * 0.3
        + (F.lit(1.0) - pr) * 0.1
    )


WINNOW_B = 1000003
WINNOW_P = 2_147_483_647
WINNOW_K = 4  # char-gram width
WINNOW_W = 5  # winnowing window


def winnow_fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Winnowing document fingerprints (the MOSS scheme): polynomial
    rolling hash over char 4-grams (Horner mod 2³¹-1), minimum of each
    5-hash window, distinct selected hashes = the fingerprint set.

    Executed as vectorized numpy per Arrow batch (codepoints via
    utf-32 view, sliding-window min) — ~50× the interpreted higher-order-
    function form. The DuckDB oracle reproduces the identical integer
    arithmetic, so results hash-match exactly. Docs with fewer than
    k+w-1 chars have no fingerprint (dropped, matching the oracle's
    len-guard)."""
    import numpy as np
    import pandas as pd

    def batches(it):
        for pdf in it:
            ids, n_fps, min_fps = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(
                    np.int64
                )
                n = len(cps) - WINNOW_K + 1
                if n < WINNOW_W:
                    continue
                h = cps[:n].copy()
                for j in range(1, WINNOW_K):
                    h = (h * WINNOW_B + cps[j : j + n]) % WINNOW_P
                win = np.lib.stride_tricks.sliding_window_view(h, WINNOW_W).min(axis=1)
                fp = np.unique(win)
                ids.append(doc_id)
                n_fps.append(len(fp))
                min_fps.append(int(fp.min()))
            yield pd.DataFrame({id_col: ids, "n_fp": n_fps, "min_fp": min_fps})

    from geostore_spark.operators.util import rebalance_for_python

    return rebalance_for_python(df.select(id_col, text_col)).mapInPandas(
        batches, f"{id_col} long, n_fp int, min_fp long"
    )


def _winnow_oracle() -> str:
    b, p = WINNOW_B, WINNOW_P
    return f"""
       WITH g AS (
         SELECT doc_id,
                list_transform(range(1, length(text) - 2),
                  i -> ((((CAST(unicode(substring(text, i, 1)) AS BIGINT) * {b}
                         + unicode(substring(text, i+1, 1))) % {p})
                         * {b} + unicode(substring(text, i+2, 1))) % {p}
                         * {b} + unicode(substring(text, i+3, 1))) % {p}) AS hs
         FROM documents
       ),
       w AS (
         SELECT doc_id,
                list_distinct(list_transform(range(1, len(hs) - 3),
                  i -> least(hs[i], hs[i+1], hs[i+2], hs[i+3], hs[i+4]))) AS fp
         FROM g WHERE len(hs) >= 5
       )
       SELECT doc_id, len(fp) AS n_fp, list_min(fp) AS min_fp
       FROM w ORDER BY doc_id LIMIT 200"""


@register(
    "x_text_winnow",
    "Winnowing fingerprints (rolling-hash k-grams, min-per-window, MOSS): "
    "vectorized numpy per Arrow batch; oracle reproduces the identical "
    "integer arithmetic in SQL.",
    _winnow_oracle(),
)
def text_winnow(spark: SparkSession, sf: str) -> DataFrame:
    return (
        winnow_fingerprints(load_table_for_compute(spark, "documents", sf))
        .orderBy("doc_id")
        .limit(200)
    )


def _lexicon_values_sql() -> str:
    rows = ", ".join(
        f"('{lang}', '{w}')" for lang, words in sorted(STOPWORDS.items()) for w in words
    )
    return f"(VALUES {rows}) AS lex(lex_lang, word)"


@register(
    "x_text_lang_id",
    "Language identification via stopword-lexicon hit counting with "
    "deterministic tie-break; 'und' when no lexicon token matches. "
    "Pure per-row projection (higher-order filter over the token array) — "
    "no explode, no shuffle.",
    f"""WITH tok AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
       ),
       hits AS (
         SELECT t.doc_id, lex.lex_lang, COUNT(*) AS cnt
         FROM tok t JOIN {_lexicon_values_sql()} ON t.word = lex.word
         GROUP BY t.doc_id, lex.lex_lang
       ),
       best AS (
         SELECT doc_id, lex_lang,
                ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY cnt DESC, lex_lang) AS rn
         FROM hits
       )
       SELECT d.doc_id, COALESCE(b.lex_lang, 'und') AS pred_lang
       FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
         ON d.doc_id = b.doc_id
       ORDER BY d.doc_id LIMIT 200""",
)
def text_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    # Per-row formulation: one hit-count expression per language over the
    # token array, argmax via chained CASE (tie-break = lang asc, matching
    # the oracle's ROW_NUMBER ordering). Zero shuffles before the final
    # top-k — at 100 TB this is a single codegen'd projection pass, where
    # the explode→join→groupBy→window form shuffles the full token stream
    # three times.
    docs = load_table_for_compute(spark, "documents", sf)
    toks = F.split("text", " ")
    langs = sorted(STOPWORDS)
    hits = {
        lang: F.size(
            F.filter(toks, lambda t: t.isin(*STOPWORDS[lang]))  # noqa: B023
        )
        for lang in langs
    }
    best = F.greatest(*hits.values())
    pred = F.when(best <= 0, F.lit("und"))
    for lang in langs:  # first lang (asc) reaching the max wins ties
        pred = pred.when(hits[lang] == best, F.lit(lang))
    return (
        docs.select("doc_id", pred.alias("pred_lang"))
        .orderBy("doc_id")
        .limit(200)
    )


@register(
    "x_text_fingerprint",
    "Document fingerprinting: md5 over whitespace-normalized text plus a "
    "64-bucket shard key derived from the digest prefix — the partitioning "
    "story for exact dedup at 100 TB.",
    """SELECT doc_id,
              md5(regexp_replace(lower(text), '\\s+', ' ')) AS fp,
              ('0x' || substring(md5(regexp_replace(lower(text), '\\s+', ' ')), 1, 8))::BIGINT
                % 64 AS shard
       FROM documents ORDER BY doc_id LIMIT 200""",
)
def text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    fp = F.md5(norm.cast("binary"))
    shard = (F.conv(F.substring(fp, 1, 8), 16, 10).cast("bigint") % 64).alias("shard")
    return (
        load_table_for_compute(spark, "documents", sf)
        .select("doc_id", fp.alias("fp"), shard)
        .orderBy("doc_id")
        .limit(200)
    )


# -- repetition / degenerate-text filters (Gopher-style) --------------------


@register(
    "x_text_repetition",
    "Repetition quality filters a la the Gopher rules: duplicate-word "
    "fraction and top-bigram fraction per document, flagging degenerate "
    "boilerplate. Per-row counts are codegen'd; the bigram mode is an "
    "explode -> two-level count with map-side partial aggregation (the "
    "per-(doc,gram) shuffle key is unique per doc, so no hot keys).",
    """WITH w AS (
         SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
       ),
       base AS (
         SELECT doc_id, len(ws) AS n_tok, len(list_distinct(ws)) AS n_uniq
         FROM w WHERE len(ws) >= 2
       ),
       bg AS (
         SELECT doc_id,
                unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS g
         FROM w WHERE len(ws) >= 2
       ),
       bgc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g),
       top AS (SELECT doc_id, MAX(c) AS max_bg FROM bgc GROUP BY doc_id)
       SELECT b.doc_id, n_tok,
              1.0 - CAST(n_uniq AS DOUBLE) / n_tok AS dup_word_frac,
              CAST(max_bg AS DOUBLE) / (n_tok - 1) AS top_bigram_frac,
              (1.0 - CAST(n_uniq AS DOUBLE) / n_tok) > 0.5
                OR CAST(max_bg AS DOUBLE) / (n_tok - 1) > 0.1 AS low_quality
       FROM base b JOIN top t ON b.doc_id = t.doc_id
       ORDER BY b.doc_id LIMIT 200""",
)
def text_repetition(spark: SparkSession, sf: str) -> DataFrame:
    # hash(doc_id) rebalance (r11): the (doc_id, g) bigram count, the
    # per-doc max rollup and the base join are all clustered on doc_id,
    # so the scan exchange is the only shuffle in the plan
    docs = load_table_for_compute(spark, "documents", sf, keys=["doc_id"])
    words = F.split(F.trim("text"), " ")
    base = docs.select(
        "doc_id",
        F.size(words).alias("n_tok"),
        F.size(F.array_distinct(words)).alias("n_uniq"),
    ).filter(F.col("n_tok") >= 2)
    # non-distinct bigram stream; zip_with/slice are interpreted but
    # per-row trivial — the heavy part (counting) stays codegen'd
    bigrams = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with("
                    "  slice(split(trim(text), ' '), 1, size(split(trim(text), ' ')) - 1),"
                    "  slice(split(trim(text), ' '), 2, size(split(trim(text), ' ')) - 1),"
                    "  (a, b) -> concat(a, ' ', b))"
                )
            ).alias("g"),
        )
        .groupBy("doc_id", "g")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("max_bg"))
    )
    dup_frac = 1.0 - F.col("n_uniq").cast("double") / F.col("n_tok")
    top_frac = F.col("max_bg").cast("double") / (F.col("n_tok") - 1)
    return (
        base.join(bigrams, "doc_id")
        .select(
            "doc_id",
            "n_tok",
            dup_frac.alias("dup_word_frac"),
            top_frac.alias("top_bigram_frac"),
            ((dup_frac > 0.5) | (top_frac > 0.1)).alias("low_quality"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


# -- TF-IDF ------------------------------------------------------------------


@register(
    "x_text_tfidf",
    "Per-document top-5 TF-IDF terms: explode -> (doc,term) counts with "
    "map-side partial agg, document frequency from the same exploded pass, "
    "corpus size broadcast as a 1-row dimension. Rank within doc is by the "
    "integer (tf DESC, term ASC) key so ordering never depends on float "
    "rounding; the float tfidf rides along as a payload column.",
    """WITH tok AS (
         SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
         FROM documents
       ),
       tf AS (
         SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
       ),
       dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
       n AS (SELECT COUNT(*) AS n_docs FROM documents),
       ranked AS (
         SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
                tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df) AS tfidf,
                ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                   ORDER BY tf.tf DESC, tf.term) AS rn
         FROM tf JOIN dfreq USING (term) CROSS JOIN n
       )
       SELECT doc_id, term, tf, df, tfidf
       FROM ranked WHERE rn <= 5
       ORDER BY doc_id, term LIMIT 500""",
)
def text_tfidf(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    # One hash(doc_id) exchange serves the whole per-doc side: the
    # (doc_id, term) aggregate and the rank window are both clustered on
    # doc_id, so neither inserts its own shuffle above it.
    docs = load_table_for_compute(spark, "documents", sf, keys=["doc_id"])
    tf = (
        docs.select("doc_id", F.explode(F.split(F.trim("text"), " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # the count branch is a pure scan-aggregate; no rebalance exchange
    n = load_table(spark, "documents", sf).agg(F.count(F.lit(1)).alias("n_docs"))
    # Rank is by (tf DESC, term) — independent of df/n — so the top-5
    # filter runs BEFORE the joins: the broadcast probes and the tfidf
    # arithmetic touch <=5 rows/doc instead of every (doc, term) pair.
    w = Window.partitionBy("doc_id").orderBy(F.col("tf").desc(), F.col("term"))
    top = tf.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    # df is |vocab|-sized (tiny vs the corpus) and n is one row: both
    # broadcast so the tf side never shuffles again after doc_id.
    return (
        top.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
        )
        .select("doc_id", "term", "tf", "df", "tfidf")
        .orderBy("doc_id", "term")
        .limit(500)
    )


# -- character entropy -------------------------------------------------------


@register(
    "x_text_entropy",
    "Character-unigram Shannon entropy per document, an order-independent "
    "formulation: each (char,count) contributes the INTEGER "
    "round(c*ln(c)*1e6), summed exactly, and entropy = ln(L) - S/(1e6*L) "
    "is reconstructed per row. A float sum over group-by output would "
    "round differently under Spark's vs DuckDB's aggregation order; the "
    "integer quantization makes the aggregate associative-exact.",
    """WITH ch AS (
         SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
       ),
       cnt AS (
         SELECT doc_id, ch, COUNT(*) AS c FROM ch
         WHERE ch <> '' GROUP BY doc_id, ch
       ),
       agg AS (
         SELECT doc_id,
                CAST(SUM(c) AS BIGINT) AS n_chars,
                COUNT(*) AS n_distinct,
                SUM(CAST(round(c * ln(c) * 1000000) AS BIGINT)) AS s
         FROM cnt GROUP BY doc_id
       )
       SELECT doc_id, n_chars, n_distinct,
              ln(CAST(n_chars AS DOUBLE)) - CAST(s AS DOUBLE) / (1e6 * n_chars)
                AS entropy
       FROM agg ORDER BY doc_id LIMIT 200""",
)
def text_entropy(spark: SparkSession, sf: str) -> DataFrame:
    # hash(doc_id) rebalance (r11): both aggregates are doc_id-clustered
    # — one exchange total ahead of the TakeOrdered
    docs = load_table_for_compute(spark, "documents", sf, keys=["doc_id"])
    cnt = (
        docs.select("doc_id", F.explode(F.split("text", "")).alias("ch"))
        .filter(F.col("ch") != "")
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    term = quantize(F.col("c") * F.log("c"), 1e6)
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_chars"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(term).alias("s"),
    )
    entropy = F.log(F.col("n_chars").cast("double")) - F.col("s").cast("double") / (
        1e6 * F.col("n_chars")
    )
    return (
        agg.select("doc_id", "n_chars", "n_distinct", entropy.alias("entropy"))
        .orderBy("doc_id")
        .limit(200)
    )


# -- PII detection / redaction ----------------------------------------------

_EMAIL_PAT = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_PAT = "\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"


@register(
    "x_text_pii_redact",
    "PII detection + redaction: count email- and phone-shaped spans and "
    "replace them with [EMAIL]/[PHONE] placeholders. The fixtures carry no "
    "natural PII, so the query first synthesizes a deterministic profile "
    "string per customer (email and E.164-ish phone derived from the key) "
    "and then runs the real detector over it — the regex machinery, not "
    "the corpus, is what is under test. Pure codegen'd per-row "
    "expressions; at 100 TB this is a single scan-project pass.",
    f"""SELECT c_custkey,
              len(regexp_extract_all(profile, '{_EMAIL_PAT}')) AS n_email,
              len(regexp_extract_all(profile, '{_PHONE_PAT}')) AS n_phone,
              regexp_replace(regexp_replace(profile, '{_EMAIL_PAT}', '[EMAIL]', 'g'),
                             '{_PHONE_PAT}', '[PHONE]', 'g') AS redacted
       FROM (SELECT c_custkey,
                    printf('%s <user%d@example.com> +1-%03d-%03d-%04d',
                           c_name, c_custkey, 200 + c_custkey % 700,
                           c_custkey % 1000, c_custkey % 10000) AS profile
             FROM customer)
       ORDER BY c_custkey LIMIT 200""",
)
def text_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, "customer", sf)
    profile = F.format_string(
        "%s <user%d@example.com> +1-%03d-%03d-%04d",
        F.col("c_name"),
        F.col("c_custkey"),
        F.lit(200) + F.col("c_custkey") % 700,
        F.col("c_custkey") % 1000,
        F.col("c_custkey") % 10000,
    )
    redacted = F.regexp_replace(
        F.regexp_replace(profile, _EMAIL_PAT, "[EMAIL]"), _PHONE_PAT, "[PHONE]"
    )
    return (
        cust.select(
            "c_custkey",
            F.size(F.regexp_extract_all(profile, F.lit(_EMAIL_PAT), 0)).alias("n_email"),
            F.size(F.regexp_extract_all(profile, F.lit(_PHONE_PAT), 0)).alias("n_phone"),
            redacted.alias("redacted"),
        )
        .orderBy("c_custkey")
        .limit(200)
    )


# -- bigram language model ---------------------------------------------------


@register(
    "x_text_bigram_lm",
    "Corpus bigram language model: top-50 bigrams with count and the "
    "conditional probability P(w2|w1) = c(w1 w2)/c(w1 ·), the context "
    "count derived from the same bigram table so numerator and "
    "denominator are consistent by construction. One explode + two "
    "partially-aggregated shuffles; ordering is the integer "
    "(count DESC, bigram ASC) key.",
    """WITH w AS (
         SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
       ),
       bg AS (
         SELECT unnest(list_transform(range(1, len(ws)),
                                      i -> ws[i] || ' ' || ws[i+1])) AS g,
                unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1
         FROM w WHERE len(ws) >= 2
       ),
       bgc AS (SELECT w1, g, COUNT(*) AS c FROM bg GROUP BY w1, g),
       ctx AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cw1 FROM bgc GROUP BY w1)
       SELECT g AS bigram, c AS cnt, cw1 AS context_cnt,
              CAST(c AS DOUBLE) / cw1 AS p_cond
       FROM bgc JOIN ctx USING (w1)
       ORDER BY cnt DESC, bigram LIMIT 50""",
)
def text_bigram_lm(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table_for_compute(spark, "documents", sf)
    ws = F.split(F.trim("text"), " ")
    # the explode emits only (w1, w2) — the bigram string would
    # duplicate both words across the one corpus-sized exchange and
    # triple the grouping key (the kneser_ney lever, r11 item 19); the
    # display string is rebuilt vocab²-sized after the rollup
    pairs = (
        docs.filter(F.size(ws) >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.slice(ws, 1, F.size(ws) - 1),
                    F.slice(ws, 2, F.size(ws) - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("z")
        )
        .select("z.w1", "z.w2")
    )
    bgc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    # context counts come from the bigram table itself (map-side partials;
    # |vocab|-sized result broadcast back onto the bigram side)
    ctx = bgc.groupBy("w1").agg(F.sum("cnt").alias("context_cnt"))
    return (
        bgc.join(F.broadcast(ctx), "w1")
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            "cnt",
            "context_cnt",
            (F.col("cnt").cast("double") / F.col("context_cnt")).alias("p_cond"),
        )
        .orderBy(F.col("cnt").desc(), "bigram")
        .limit(50)
    )


# -- benchmark decontamination (n-gram overlap) -----------------------------

DECON_N = 8  # word n-gram width (GPT-3/Lee-et-al-style 8-13 gram overlap)


@register(
    "x_text_decontaminate",
    "Test-set decontamination: flag every training document sharing at "
    "least one word 8-gram with the held-out benchmark slice "
    "(doc_id % 10 == 0 stands in for the eval set). Returns per "
    "contaminated doc the distinct shared grams and distinct benchmark "
    "docs hit. The benchmark gram set is broadcast — real eval suites "
    "are millions of grams, far under the broadcast threshold — so the "
    "100 TB training side never shuffles: scan → hash → broadcast-join "
    "→ partially-aggregated groupBy(doc_id).",
    f"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       g AS (
         SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, len(ws) - {DECON_N - 2}),
                                      i -> array_to_string(ws[i : i + {DECON_N - 1}], ' '))) AS s
         FROM w WHERE len(ws) >= {DECON_N}
       ),
       t AS (SELECT doc_id, s FROM g WHERE doc_id % 10 != 0),
       b AS (SELECT doc_id AS bench_id, s FROM g WHERE doc_id % 10 = 0)
       SELECT t.doc_id, COUNT(DISTINCT t.s) AS n_shared_grams,
              COUNT(DISTINCT b.bench_id) AS n_bench_docs
       FROM t JOIN b ON t.s = b.s
       GROUP BY t.doc_id ORDER BY t.doc_id""",
)
def text_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Training-corpus decontamination against a benchmark slice.

    Spark shape: both sides shingle via the vectorized Arrow pass
    (dedup.shingle_rows), grams reduce to 64-bit hashes, the benchmark
    side broadcasts, and the join output aggregates straight to per-doc
    counts (two distinct-counts over one expand — no second shuffle).
    Counting distinct hashes equals counting distinct grams absent
    xxhash64 collisions, which the corpus sizes here make negligible.
    """
    docs = load_table_for_compute(spark, "documents", sf)
    return (
        decontamination_hits(docs)
        .groupBy("doc_id")
        .agg(
            F.countDistinct("h").alias("n_shared_grams"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
        .orderBy("doc_id")
    )


def decontamination_hits(docs: DataFrame) -> DataFrame:
    """(doc_id, h, bench_id) rows: training doc × shared-8-gram-hash ×
    benchmark doc. The benchmark gram set broadcasts; the training side
    never shuffles."""
    from geostore_spark.operators.dedup import shingle_rows

    bench_grams = shingle_rows(
        docs.filter(F.col("doc_id") % 10 == 0), "doc_id", "text", DECON_N
    ).select(F.col("doc_id").alias("bench_id"), F.xxhash64("s").alias("h"))
    train_grams = shingle_rows(
        docs.filter(F.col("doc_id") % 10 != 0), "doc_id", "text", DECON_N
    ).select("doc_id", F.xxhash64("s").alias("h"))
    return train_grams.join(F.broadcast(bench_grams), "h")


# -- LM-based quality filtering (CCNet-style) --------------------------------


@register(
    "x_text_perplexity",
    "LM quality filter: score every document by its average negative "
    "bigram log-likelihood under the corpus bigram LM (the CCNet-style "
    "perplexity filter that buckets a crawl into head/middle/tail). The "
    "LM table is vocab^2-bounded — tiny next to the corpus — so scoring "
    "is a broadcast join; per-bigram log terms are integer-quantized at "
    "1e-6 so the per-doc sum is associative-exact across engines.",
    """WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
       bg AS (
         SELECT doc_id,
                unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
                unnest(list_transform(range(1, len(ws)),
                                      i -> ws[i] || ' ' || ws[i+1])) AS g
         FROM w WHERE len(ws) >= 2
       ),
       bgc AS (SELECT w1, g, COUNT(*) AS c FROM bg GROUP BY w1, g),
       ctx AS (SELECT w1, SUM(c) AS cw1 FROM bgc GROUP BY w1),
       lm AS (
         SELECT g, CAST(round(ln(CAST(c AS DOUBLE) / cw1) * 1000000) AS BIGINT) AS t
         FROM bgc JOIN ctx USING (w1)
       ),
       d AS (
         SELECT doc_id, COUNT(*) AS n_bigrams, SUM(t) AS s
         FROM bg JOIN lm USING (g) GROUP BY doc_id
       )
       SELECT doc_id, n_bigrams, -CAST(s AS DOUBLE) / (1e6 * n_bigrams) AS nll
       FROM d ORDER BY doc_id LIMIT 200""",
)
def text_perplexity(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc avg negative log-likelihood under the corpus bigram LM.

    In production the LM is prebuilt from a reference corpus and only the
    broadcast-join scoring pass touches the 100 TB side; here the LM
    derives from the same fixture corpus (two partially-aggregated
    shuffles over the vocab — the fact side never shuffles)."""
    docs = load_table_for_compute(spark, "documents", sf)
    ws = F.split(F.trim("text"), " ")
    # ONE bigram explode feeds both the LM derivation and the scoring
    # join (uncheckpointed, each branch would re-run the scan+explode —
    # measured as ~2x the query at sf1); rows carry only (doc_id, g) —
    # the LM's context word w1 is a prefix of g, recovered vocab-sized
    # AFTER the bigram rollup instead of riding 25 M corpus rows.
    pairs = (
        docs.filter(F.size(ws) >= 2)
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice(ws, 1, F.size(ws) - 1),
                    F.slice(ws, 2, F.size(ws) - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("g"),
        )
        .transform(pin_branch_point)
    )
    bgc = pairs.groupBy("g").agg(F.count(F.lit(1)).alias("c")).withColumn(
        "w1", F.substring_index("g", " ", 1)
    )
    ctx = bgc.groupBy("w1").agg(F.sum("c").alias("cw1"))
    lm = bgc.join(F.broadcast(ctx), "w1").select(
        "g",
        F.round(F.log(F.col("c").cast("double") / F.col("cw1")) * 1e6, 0)
        .cast("bigint")
        .alias("t"),
    )
    agg = (
        pairs.join(F.broadcast(lm), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("t").alias("s"))
    )
    nll = -F.col("s").cast("double") / (1e6 * F.col("n_bigrams"))
    return (
        agg.select("doc_id", "n_bigrams", nll.alias("nll"))
        .orderBy("doc_id")
        .limit(200)
    )


# -- composed training-set materialization ----------------------------------

QUALITY_THRESHOLD = 0.85


@register(
    "x_pipeline_training_set",
    "The end-to-end training-set materialization a data pipeline actually "
    "runs, composed as ONE declarative plan: keep training-slice docs "
    "(benchmark slice excluded) that pass the quality threshold, survive "
    "corpus-level exact dedup (first doc per content digest), and share "
    "no 8-gram with the benchmark — then report the per-(lang, source) "
    "training mix with token counts. Catalyst fuses the quality filter "
    "into the scan; the digest window shuffles on uniform md5 keys; "
    "decontamination is a broadcast anti-join; the mix rollup gets "
    "map-side partials. One composed plan, no materialization barriers.",
    f"""WITH train AS (
         SELECT doc_id, lang, source, text,
                len(string_split_regex(trim(text), '\\s+')) AS n_tok
         FROM documents
         WHERE doc_id % 10 != 0
           AND LEAST(len(string_split_regex(trim(text), '\\s+'))/50.0, 1.0)*0.6
             + LEAST(length(replace(text, ' ', ''))
                     / len(string_split_regex(trim(text), '\\s+'))/8.0, 1.0)*0.3
             + (1.0 - len(regexp_extract_all(text, '[^a-z0-9 ]'))/length(text))*0.1
             >= {QUALITY_THRESHOLD}
       ),
       deduped AS (
         SELECT doc_id, lang, source, text, n_tok FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
           FROM train)
         WHERE rn = 1
       ),
       w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       g AS (
         SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, len(ws) - {DECON_N - 2}),
                                      i -> array_to_string(ws[i : i + {DECON_N - 1}], ' '))) AS s
         FROM w WHERE len(ws) >= {DECON_N}
       ),
       contaminated AS (
         SELECT DISTINCT t.doc_id
         FROM (SELECT doc_id, s FROM g WHERE doc_id % 10 != 0) t
         JOIN (SELECT s FROM g WHERE doc_id % 10 = 0) b ON t.s = b.s
       )
       SELECT lang, source, COUNT(*) AS n_docs,
              CAST(SUM(n_tok) AS BIGINT) AS n_tokens
       FROM deduped d
       WHERE NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = d.doc_id)
       GROUP BY lang, source ORDER BY lang, source""",
)
def pipeline_training_set(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table_for_compute(spark, "documents", sf)
    n_tok = F.size(F.split(F.trim("text"), r"\s+"))
    train = docs.filter(
        (F.col("doc_id") % 10 != 0) & (quality_expr() >= QUALITY_THRESHOLD)
    ).select("doc_id", "lang", "source", "text", n_tok.alias("n_tok"))
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        train.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    )
    contaminated = decontamination_hits(docs).select("doc_id").distinct()
    return (
        deduped.join(F.broadcast(contaminated), "doc_id", "left_anti")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
        .orderBy("lang", "source")
    )


HH_TOP = 20


@register(
    "x_text_heavy_hitters",
    "Corpus vocabulary head: exact top-20 tokens by total occurrences "
    "with document frequencies — the distributed word-count shape done "
    "right: explode -> ONE (token, doc) partial-aggregated shuffle that "
    "feeds both the occurrence sum and the doc-frequency count, then "
    "TakeOrdered merges per-partition winners (never a global sort). "
    "The per-token state is two counters, so a hot token (every corpus "
    "has 'the') costs map-side combining, not a hot reducer.",
    f"""WITH tok AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS token
         FROM documents
       ),
       per_doc AS (
         SELECT token, doc_id, COUNT(*) AS n
         FROM tok WHERE token != '' GROUP BY token, doc_id
       ),
       agg AS (
         SELECT token, CAST(SUM(n) AS BIGINT) AS occurrences,
                COUNT(*) AS doc_freq
         FROM per_doc GROUP BY token
       )
       SELECT token, occurrences, doc_freq
       FROM agg ORDER BY occurrences DESC, token LIMIT {HH_TOP}""",
)
def text_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table_for_compute(spark, "documents", sf)
    per_doc = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        per_doc.groupBy("token")
        .agg(
            F.sum("n").cast("bigint").alias("occurrences"),
            F.count(F.lit(1)).alias("doc_freq"),
        )
        .orderBy(F.col("occurrences").desc(), "token")
        .limit(HH_TOP)
    )


# -- C4-style line-level quality rules --------------------------------------

C4_LINE_WORDS = 10  # synthesized line width (words)
C4_MIN_WORDS_PER_LINE = 5  # C4: drop lines with < 5 words
C4_MIN_KEPT_LINES = 3  # C4: drop pages with < 3 surviving sentences


@register(
    "x_text_c4_lines",
    "C4-style line-level quality filter (Raffel et al. C4 rules: min "
    "words per line, terminal punctuation required, pages need >= 3 "
    "surviving lines with a majority kept). The fixture corpus is "
    "unpunctuated word soup, so line boundaries (every 10 words) and "
    "terminal punctuation (3-in-4, keyed on (doc_id, line_idx)) are "
    "synthesized deterministically — identical arithmetic both engines. "
    "The whole operator is one zero-shuffle scan-projection: per-row "
    "sequence/filter higher-order expressions, no explode, no Python.",
    f"""WITH d AS (
         SELECT doc_id, len(string_split(text, ' ')) AS n_words
         FROM documents
       ),
       l AS (
         SELECT doc_id, n_words, (n_words + {C4_LINE_WORDS - 1}) // {C4_LINE_WORDS} AS n_lines
         FROM d
       ),
       k AS (
         SELECT doc_id, n_lines,
                len(list_filter(range(0, n_lines),
                    i -> least({C4_LINE_WORDS}, n_words - i*{C4_LINE_WORDS})
                           >= {C4_MIN_WORDS_PER_LINE}
                         AND ((doc_id*7 + i) % 4) != 0)) AS n_kept
         FROM l
       )
       SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
              CAST(n_kept AS BIGINT) AS n_kept,
              CAST(CASE WHEN n_kept >= {C4_MIN_KEPT_LINES}
                         AND 2*n_kept >= n_lines THEN 1 ELSE 0 END AS INT)
                AS doc_kept
       FROM k ORDER BY doc_id""",
)
def text_c4_lines(spark: SparkSession, sf: str) -> DataFrame:
    # Plain scan, deliberately: the r10 row-group rebalance was probed
    # here (sf1 interleaved medians of 5) at 1.77 s vs 1.57 s plain —
    # the arithmetic-only line synthesis is cheap enough per row that
    # the round-robin exchange costs more than the parallelism buys.
    docs = load_table(spark, "documents", sf)
    w, mw = C4_LINE_WORDS, C4_MIN_WORDS_PER_LINE
    base = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_words")
    ).withColumn("n_lines", F.expr(f"(n_words + {w - 1}) div {w}"))
    kept = base.withColumn(
        "n_kept",
        F.expr(
            f"size(filter(sequence(0, n_lines - 1), "
            f"i -> least({w}, n_words - i*{w}) >= {mw} "
            f"and ((doc_id*7 + i) % 4) != 0))"
        ).cast("bigint"),
    )
    doc_kept = (
        (F.col("n_kept") >= C4_MIN_KEPT_LINES)
        & (2 * F.col("n_kept") >= F.col("n_lines"))
    ).cast("int")
    return kept.select(
        "doc_id",
        F.col("n_lines").cast("bigint").alias("n_lines"),
        "n_kept",
        doc_kept.alias("doc_kept"),
    ).orderBy("doc_id")


# -- Gopher document-level quality rules ------------------------------------

GOPHER_MIN_WORDS = 30
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WLEN = 3.0
GOPHER_MAX_MEAN_WLEN = 10.0
GOPHER_MIN_STOP_HITS = 2
GOPHER_STOPS = ("the", "a", "of", "to", "and", "in", "that", "is")


@register(
    "x_text_gopher_rules",
    "Gopher document-level quality rules (Rae et al. 2021 Table A1 "
    "subset): word-count bounds, mean-word-length window, minimum "
    "stop-word occurrences — the standard pre-training document gate, "
    "as ONE zero-shuffle scan-projection of codegen expressions. "
    "Mean word length is exact integer arithmetic over a single-spaced "
    "corpus: (chars - spaces) / words.",
    f"""WITH d AS (
         SELECT doc_id,
                len(string_split(text, ' ')) AS n_words,
                length(text) AS n_chars,
                len(list_filter(string_split(text, ' '),
                    w -> w IN {GOPHER_STOPS!r})) AS stop_hits
         FROM documents
       )
       SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
              ROUND(CAST(n_chars - n_words + 1 AS DOUBLE) / n_words, 4)
                AS mean_wlen,
              CAST(stop_hits AS BIGINT) AS stop_hits,
              CAST(CASE WHEN n_words >= {GOPHER_MIN_WORDS}
                         AND n_words <= {GOPHER_MAX_WORDS}
                         AND CAST(n_chars - n_words + 1 AS DOUBLE) / n_words
                             >= {GOPHER_MIN_MEAN_WLEN}
                         AND CAST(n_chars - n_words + 1 AS DOUBLE) / n_words
                             <= {GOPHER_MAX_MEAN_WLEN}
                         AND stop_hits >= {GOPHER_MIN_STOP_HITS}
                   THEN 1 ELSE 0 END AS INT) AS doc_pass
       FROM d ORDER BY doc_id""",
)
def text_gopher_rules(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table_for_compute(spark, "documents", sf)
    stops = ", ".join(f"'{s}'" for s in GOPHER_STOPS)
    base = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_words"),
        F.length("text").alias("n_chars"),
        F.expr(
            f"size(filter(split(text, ' '), w -> w IN ({stops})))"
        ).alias("stop_hits"),
    )
    mean_wlen = (F.col("n_chars") - F.col("n_words") + 1).cast("double") / F.col(
        "n_words"
    )
    doc_pass = (
        (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("n_words") <= GOPHER_MAX_WORDS)
        & (mean_wlen >= GOPHER_MIN_MEAN_WLEN)
        & (mean_wlen <= GOPHER_MAX_MEAN_WLEN)
        & (F.col("stop_hits") >= GOPHER_MIN_STOP_HITS)
    ).cast("int")
    return base.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.round(mean_wlen, 4).alias("mean_wlen"),
        F.col("stop_hits").cast("bigint").alias("stop_hits"),
        doc_pass.alias("doc_pass"),
    ).orderBy("doc_id")


# -- BM25 retrieval scoring -------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("customer", "spark", "window", "vector")
BM25_TOP = 20


@register(
    "x_text_bm25",
    "BM25 retrieval scoring against a fixed query-term set (Robertson/ "
    "Sparck Jones Okapi weighting) — the lexical-retrieval primitive "
    "next to the ANN family. The corpus only materializes the QUERY "
    "terms' posting lists (the IN-list filter pushes ahead of the "
    "shuffle, so the (doc,term) aggregate is posting-list-sized, not "
    "corpus-sized); df/avgdl are a 4-row + scalar broadcast. Per-term "
    "scores are integer-quantized (round(score*1e6), the perplexity "
    "technique) so the sum is associative-exact and the oracle matches "
    "bit-for-bit; top-k is a TakeOrdered merge.",
    f"""WITH d AS (
         SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
       ),
       stats AS (
         SELECT COUNT(*) AS n_docs,
                CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
         FROM d
       ),
       tok AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
       ),
       tf AS (
         SELECT doc_id, t, COUNT(*) AS tf FROM tok
         WHERE t IN {BM25_QUERY!r} GROUP BY doc_id, t
       ),
       df AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
       scored AS (
         SELECT tf.doc_id,
                CAST(ROUND(1e6 *
                  ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) *
                  (tf.tf * ({BM25_K1} + 1.0)) /
                  (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                    + {BM25_B} * d.dl / stats.avgdl)), 0) AS BIGINT)
                  AS sq
         FROM tf JOIN d ON tf.doc_id = d.doc_id CROSS JOIN stats
         JOIN df ON tf.t = df.t
       )
       SELECT doc_id, CAST(SUM(sq) AS BIGINT) AS score_q,
              COUNT(*) AS n_hit_terms
       FROM scored GROUP BY doc_id
       ORDER BY score_q DESC, doc_id LIMIT {BM25_TOP}""",
)
def text_bm25(spark: SparkSession, sf: str) -> DataFrame:
    # hash(doc_id) rebalance: the (doc_id, t) posting aggregate, the
    # tf<->d doc-length join, and the final per-doc score rollup are all
    # clustered on doc_id, so the scan exchange is the only doc-keyed
    # shuffle in the plan.
    docs = load_table_for_compute(spark, "documents", sf, keys=["doc_id"])
    d = docs.select("doc_id", F.size(F.split(F.col("text"), " ")).alias("dl"))
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("t"))
        .filter(F.col("t").isin(*BM25_QUERY))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_tab = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_norm = (F.col("tf") * (BM25_K1 + 1.0)) / (
        F.col("tf")
        + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    sq = F.round(F.lit(1e6) * idf * tf_norm, 0).cast("bigint")
    return (
        tf.join(d, "doc_id")
        .join(F.broadcast(stats))
        .join(F.broadcast(df_tab), "t")
        .select("doc_id", sq.alias("sq"))
        .groupBy("doc_id")
        .agg(
            F.sum("sq").cast("bigint").alias("score_q"),
            F.count(F.lit(1)).alias("n_hit_terms"),
        )
        .orderBy(F.col("score_q").desc(), "doc_id")
        .limit(BM25_TOP)
    )


# -- blocked fuzzy (edit-distance) join -------------------------------------

FUZZY_MAX_DIST = 2
# Sub-blocks per blocking key: oversized blocks are fragment-and-replicate
# salted so per-task pair count is (block/S) x block instead of block^2,
# and reducer parallelism is (n_blocks x S) instead of n_blocks. At 100 TB
# S scales with observed block size (rows / target_pairs_per_task); here a
# fixed 16 turns the 25-nation ceiling into 400 schedulable units.
FUZZY_SUBBLOCKS = 16
# Sensor early-exit: when the salted block DP's own candidate count
# (sum of squared block sizes) is already this small, run it without
# paying for the heavier PassJoin/symdel estimators — ~50 M
# threshold-bounded DP calls clear in a few seconds on one node's
# cores, and small corpora should not fund two extra aggregations to
# choose between strategies whose savings are bounded by that.
FUZZY_BLOCK_DP_OK = 50_000_000


@register(
    "x_text_fuzzy_join",
    "Entity-resolution fuzzy join: customer-name pairs within "
    "Levenshtein distance 2, blocked on nationkey so comparison never "
    "runs across the corpus. THREE candidate strategies behind a "
    "cheapest-first cost sensor: salted block DP (fragment-and-"
    "replicate sub-blocks — skew-proof quadratic, taken directly when "
    "its own pair count is small), PassJoin segment equi-join "
    "(pigeonhole: one of d+1 segments survives any d edits — wins on "
    "dispersed corpora), and a symmetric-delete neighborhood join "
    "(lev<=d implies a shared <=d-deletion variant; equi-join on "
    "hashed variants, packed-key pair dedup — immune to the constant "
    "templates that collapse segment buckets, carrying a ~len^2/2x "
    "variant index the sensor demands a 2x candidate edge to fund). "
    "Survivors verify through threshold-bounded levenshtein(a, b, "
    "max_dist) — banded O(d*n) DP with early exit — and roll up per "
    "nation, so the result is block-count-sized.",
    f"""WITH p AS (
         SELECT a.c_nationkey AS nation,
                levenshtein(a.c_name, b.c_name) AS d
         FROM customer a JOIN customer b
           ON a.c_nationkey = b.c_nationkey
          AND a.c_custkey < b.c_custkey
          AND abs(length(a.c_name) - length(b.c_name)) <= {FUZZY_MAX_DIST}
         WHERE levenshtein(a.c_name, b.c_name) <= {FUZZY_MAX_DIST}
       )
       SELECT nation, COUNT(*) AS n_pairs, MIN(d) AS min_dist,
              CAST(SUM(d) AS BIGINT) AS sum_dist
       FROM p GROUP BY nation ORDER BY nation""",
)
def text_fuzzy_join(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, "customer", sf).select(
        "c_custkey", "c_name", "c_nationkey"
    )
    return fuzzy_edit_join(cust)


def fuzzy_edit_join(cust_in: DataFrame, force: str | None = None) -> DataFrame:
    # THREE candidate-generation strategies, chosen at runtime by a
    # cost sensor (the triangle/pagerank dispatch pattern applied to
    # string joins — none dominates, the DATA decides):
    #
    # 1. PassJoin segment indexing (Li, Deng, Wang, Feng — VLDB'11
    #    family): partition every string into d+1 = 3 even segments;
    #    if ed(a, b) <= d then by pigeonhole at least one of b's
    #    segments survives EXACTLY in a, shifted by <= d positions, so
    #    candidates come from an EQUI-join on (nation, |b|, segment
    #    index, segment text) with a ~constant probe fan-out per row.
    #    Candidates scale with segment-bucket collision counts — tiny
    #    on dispersed real-world names, but a corpus with ANY constant
    #    segment (an 18-char template whose first 12 chars never vary)
    #    collapses that segment into one bucket per nation and the
    #    equi-join degenerates to the full quadratic.
    #
    # 2. Salted block DP: all ordered in-block pairs meet a
    #    threshold-bounded levenshtein, fragment-and-replicate salted
    #    into S sub-blocks so per-task work is (block/S) x block and
    #    parallelism is blocks x S. Cost is exactly Sum(block^2)/2 —
    #    skew-proof, never better than quadratic.
    #
    # 3. Symmetric-delete neighborhood join (the SymSpell family): if
    #    lev(a, b) <= d then deleting the <= d non-matched characters
    #    from each side of an optimal alignment leaves a COMMON string,
    #    so candidates come from an equi-join on (nation,
    #    xxhash64(delete-variant)) where every string emits its
    #    O(len^d) <= d-deletion variants. Immune to constant templates
    #    (a shared variant pins len-2 of len characters in order), at
    #    the price of a ~(1 + len + len^2/2)x variant index — which is
    #    why the sensor demands a 2x candidate advantage before paying
    #    for it. Candidates carry multiplicity (near-pairs share many
    #    variants); pairs dedup on a packed key BEFORE the DP verify.
    #
    # Sensors run cheapest-first with an early exit: the block-DP
    # estimate is one nation-count aggregate, and when it is already
    # under FUZZY_BLOCK_DP_OK the quadratic is cheaper than the
    # estimators that would replace it (r10: this keeps the sf0.1 wall
    # sensor-free). Past the exit, all three costs are sums of squared
    # bucket sizes (candidate counts) — pick the smallest, with the 2x
    # index-cost handicap on symdel.
    dmax = FUZZY_MAX_DIST
    nseg = dmax + 1
    cust = cust_in.select(
        "c_custkey", "c_name", "c_nationkey", F.length("c_name").alias("ln")
    )
    block_dp_est = cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("m")
    ).agg(F.sum(F.col("m") * F.col("m"))).collect()[0][0] or 0

    b = None
    vtab = None
    passjoin_est = None
    symdel_est = None
    if force is not None:
        strategy = force
    elif block_dp_est <= FUZZY_BLOCK_DP_OK:
        strategy = "block_dp"
    else:
        b = _fuzzy_segment_index(cust, nseg)
        passjoin_est = b.groupBy("b_nation", "b_ln", "i", "seg").agg(
            F.count(F.lit(1)).alias("m")
        ).agg(F.sum(F.col("m") * F.col("m"))).collect()[0][0] or 0
        vtab = _fuzzy_delete_variants(cust, dmax)
        symdel_est = vtab.groupBy("nation", "vh").agg(
            F.count(F.lit(1)).alias("m")
        ).agg(
            F.sum(F.col("m") * (F.col("m") - 1) / 2)
        ).collect()[0][0] or 0
        if symdel_est < 0.5 * min(passjoin_est, block_dp_est):
            strategy = "symdel"
        elif passjoin_est <= block_dp_est:
            strategy = "passjoin"
        else:
            strategy = "block_dp"
    log_event(
        LOG_MESSAGE_STRATEGY_DISPATCH,
        stage="fuzzy_join",
        passjoin_candidates=None if passjoin_est is None else int(passjoin_est),
        block_dp_candidates=int(block_dp_est),
        symdel_candidates=None if symdel_est is None else int(symdel_est),
        strategy=strategy,
    )

    if strategy == "symdel":
        if vtab is None:
            vtab = _fuzzy_delete_variants(cust, dmax)
        return _fuzzy_symdel_join(cust, vtab, dmax)

    if strategy == "passjoin":
        if b is None:
            b = _fuzzy_segment_index(cust, nseg)
        a = _fuzzy_segment_probe(cust, nseg, dmax)
        cand = (
            a.join(
                b,
                (F.col("a_nation") == F.col("b_nation"))
                & (F.col("lb") == F.col("b_ln"))
                & (F.col("pi") == F.col("i"))
                & (F.col("sub") == F.col("seg"))
                & (F.col("a_key") < F.col("b_key")),
            )
            .select("a_nation", "a_key", "b_key", "a_name", "b_name")
            .dropDuplicates(["a_key", "b_key"])
        )
        # strings too short to carry 3 non-empty segments can only pair
        # with strings in the length band — both sides tiny; brute-force
        shortb = cust.filter(F.col("ln") < nseg).alias("sb")
        shorta = cust.filter(F.col("ln") < nseg + dmax).alias("sa")
        brute = (
            shorta.join(
                shortb,
                (F.col("sa.c_nationkey") == F.col("sb.c_nationkey"))
                & (F.col("sa.c_custkey") < F.col("sb.c_custkey"))
                & (F.abs(F.col("sa.ln") - F.col("sb.ln")) <= dmax),
            )
            .select(
                F.col("sa.c_nationkey").alias("a_nation"),
                F.col("sa.c_custkey").alias("a_key"),
                F.col("sb.c_custkey").alias("b_key"),
                F.col("sa.c_name").alias("a_name"),
                F.col("sb.c_name").alias("b_name"),
            )
        )
        cand = cand.unionByName(brute)
    else:
        S = FUZZY_SUBBLOCKS
        # probe keeps one salt per row; build replicates to every salt —
        # each pair meets exactly once, in the probe row's sub-block
        pa = (
            cust.withColumn("g", F.pmod(F.hash("c_custkey"), F.lit(S)))
            .repartition(2 * S, "c_nationkey", "g")
            .alias("pa")
        )
        pb = cust.withColumn(
            "g", F.explode(F.array(*[F.lit(i) for i in range(S)]))
        ).alias("pb")
        cand = pa.join(
            pb,
            (F.col("pa.c_nationkey") == F.col("pb.c_nationkey"))
            & (F.col("pa.g") == F.col("pb.g"))
            & (F.col("pa.c_custkey") < F.col("pb.c_custkey"))
            & (F.abs(F.col("pa.ln") - F.col("pb.ln")) <= dmax),
        ).select(
            F.col("pa.c_nationkey").alias("a_nation"),
            F.col("pa.c_custkey").alias("a_key"),
            F.col("pb.c_custkey").alias("b_key"),
            F.col("pa.c_name").alias("a_name"),
            F.col("pb.c_name").alias("b_name"),
        )
    return _fuzzy_verify_rollup(cand, dmax)


def _fuzzy_verify_rollup(cand: DataFrame, dmax: int) -> DataFrame:
    """Threshold-bounded DP only on surviving candidates (returns -1
    when the distance exceeds the bound, the exact distance otherwise),
    rolled up per nation."""
    d = F.levenshtein(F.col("a_name"), F.col("b_name"), dmax)
    return (
        cand.select(F.col("a_nation").alias("nation"), d.alias("d"))
        .filter(F.col("d") >= 0)
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("d").alias("min_dist"),
            F.sum("d").cast("bigint").alias("sum_dist"),
        )
        .orderBy("nation")
    )


def _fuzzy_segment_index(cust: DataFrame, nseg: int) -> DataFrame:
    """PassJoin build side: every string's nseg even segments, pinned
    (the sensor aggregates it and the join reuses it)."""
    seg_len = "(L div {n}) + (case when i < (L % {n}) then 1 else 0 end)"
    seg_start = "1 + i * (L div {n}) + least(i, L % {n})"
    return cust.filter(F.col("ln") >= nseg).selectExpr(
        "c_custkey", "c_name", "c_nationkey", "ln",
        f"""explode(transform(sequence(0, {nseg - 1}), i ->
              struct(i as i,
                     substr(c_name,
                            {seg_start.format(n=nseg).replace('L', 'ln')},
                            {seg_len.format(n=nseg).replace('L', 'ln')})
                       as seg))) as bk""",
    ).select(
        F.col("c_nationkey").alias("b_nation"),
        F.col("c_custkey").alias("b_key"),
        F.col("c_name").alias("b_name"),
        F.col("ln").alias("b_ln"),
        F.col("bk.i").alias("i"),
        F.col("bk.seg").alias("seg"),
    ).transform(pin_branch_point)


def _fuzzy_segment_probe(cust: DataFrame, nseg: int, dmax: int) -> DataFrame:
    """PassJoin probe side: every (build length Lb, segment i, start p)
    triple whose segment could have survived from a within-distance
    partner."""
    seg_len = "(L div {n}) + (case when i < (L % {n}) then 1 else 0 end)"
    seg_start = "1 + i * (L div {n}) + least(i, L % {n})"
    return cust.selectExpr(
        "c_custkey", "c_name", "c_nationkey", "ln",
        f"""explode(flatten(transform(
              sequence(greatest(ln - {dmax}, {nseg}), ln + {dmax}), Lb ->
              flatten(transform(sequence(0, {nseg - 1}), i ->
                transform(
                  sequence(
                    greatest({seg_start.format(n=nseg).replace('L', 'Lb')}
                             - {dmax}, 1),
                    {seg_start.format(n=nseg).replace('L', 'Lb')} + {dmax}
                  ), p ->
                  struct(Lb as lb, i as i,
                         substr(c_name, p,
                                {seg_len.format(n=nseg).replace('L', 'Lb')})
                           as sub))))))) as pk""",
    ).select(
        F.col("c_nationkey").alias("a_nation"),
        F.col("c_custkey").alias("a_key"),
        F.col("c_name").alias("a_name"),
        F.col("pk.lb").alias("lb"),
        F.col("pk.i").alias("pi"),
        F.col("pk.sub").alias("sub"),
    )


def _fuzzy_delete_variants(cust: DataFrame, dmax: int) -> DataFrame:
    """Symdel index: (nation, key, xxhash64(variant)) for every
    <= dmax-deletion variant of every string, pinned (the sensor
    aggregates it and the join consumes it twice).

    The 64-bit hash stands in for the variant TEXT in the join key —
    an 8-byte exchange instead of a ~len-byte string, and a hash
    collision merely adds one false candidate for the DP verify to
    reject. The input repartitions first: the variant fan-out is
    ~len^2/2 per row, and an upstream single-file scan would otherwise
    generate the whole index in one task. Within-name duplicate
    variants (deletions inside equal-character runs) are NOT
    deduplicated here — array_distinct is O(variants^2) comparisons
    per row and the pair dedup downstream absorbs the multiplicity."""
    assert dmax == 2, "variant generator is specialized to d = 2"
    variants = F.flatten(
        F.array(
            F.array(F.col("c_name")),
            F.expr(
                "transform(sequence(1, ln), i ->"
                " concat(substr(c_name, 1, i - 1), substr(c_name, i + 1, ln)))"
            ),
            F.expr(
                "flatten(transform(sequence(1, ln - 1), i ->"
                " transform(sequence(i + 1, ln), j ->"
                " concat(substr(c_name, 1, i - 1),"
                "        substr(c_name, i + 1, j - i - 1),"
                "        substr(c_name, j + 1, ln)))))"
            ),
        )
    )
    spark = cust.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return (
        cust.repartition(shuffle_n)
        .select(
            F.col("c_nationkey").alias("nation"),
            F.col("c_custkey").alias("key"),
            F.explode(variants).alias("v"),
        )
        .select("nation", "key", F.xxhash64("v").alias("vh"))
        .transform(pin_branch_point)
    )


def _fuzzy_symdel_join(cust: DataFrame, vtab: DataFrame, dmax: int) -> DataFrame:
    """Symdel candidate join + verify: equi-join the variant index with
    itself on (nation, variant hash), pack each candidate pair into one
    long, dedup the PACKED key (multiplicity never carries strings),
    then re-join the two names — dimension-sized, auto-broadcast at
    local SFs, a plain key shuffle at scale — for the bounded-DP verify."""
    in_bounds = (F.col("key") >= 0) & (F.col("key") < F.lit(1 << 31))
    guard = F.assert_true(
        in_bounds,
        F.lit("fuzzy symdel packed pair keys require custkey in [0, 2^31)"),
    )
    va = vtab.select(
        F.col("nation"),
        F.col("vh"),
        F.when(guard.isNull(), F.col("key")).alias("ka"),
    ).alias("va")
    vb = vtab.select(
        F.col("vh").alias("vh_b"),
        F.col("nation").alias("nation_b"),
        F.col("key").alias("kb"),
    ).alias("vb")
    cand_pk = (
        va.join(
            vb,
            (F.col("nation") == F.col("nation_b"))
            & (F.col("vh") == F.col("vh_b"))
            & (F.col("ka") < F.col("kb")),
        )
        .select(
            "nation",
            F.shiftleft(F.col("ka"), 32).bitwiseOR(F.col("kb")).alias("pk"),
        )
        .dropDuplicates(["pk"])
    )
    names_a = cust.select(
        F.col("c_custkey").alias("ka_j"), F.col("c_name").alias("a_name")
    )
    names_b = cust.select(
        F.col("c_custkey").alias("kb_j"), F.col("c_name").alias("b_name")
    )
    cand = (
        cand_pk.withColumn("ka_j", F.shiftright("pk", 32))
        .withColumn("kb_j", F.col("pk").bitwiseAND(F.lit((1 << 32) - 1)))
        .join(names_a, "ka_j")
        .join(names_b, "kb_j")
        .select(
            F.col("nation").alias("a_nation"), "a_name", "b_name"
        )
    )
    return _fuzzy_verify_rollup(cand, dmax)


# -- dataset card -----------------------------------------------------------


@register(
    "x_pipeline_dataset_card",
    "One-row dataset card (the datasheet header every corpus release "
    "ships): doc/token/char inventory, language count, exact-duplicate "
    "rate, and quality-gate pass rate — composed as ONE aggregation "
    "pass; the distinct-digest and distinct-lang counts ride the same "
    "Expand-based multi-distinct aggregate the profile op uses (single "
    "shuffle, map-side partials).",
    f"""SELECT COUNT(*) AS n_docs,
              CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
              CAST(SUM(length(text)) AS BIGINT) AS n_chars,
              COUNT(DISTINCT lang) AS n_langs,
              COUNT(DISTINCT source) AS n_sources,
              COUNT(*) - COUNT(DISTINCT md5(text)) AS n_exact_dupes,
              CAST(SUM(CASE WHEN len(string_split(text, ' '))
                            >= {GOPHER_MIN_WORDS} THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_pass_min_words
       FROM documents""",
)
def pipeline_dataset_card(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table_for_compute(spark, "documents", sf)
    n_words = F.size(F.split(F.col("text"), " "))
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_words).cast("bigint").alias("n_tokens"),
        F.sum(F.length("text")).cast("bigint").alias("n_chars"),
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("source").alias("n_sources"),
        (F.count(F.lit(1)) - F.count_distinct(F.md5(F.col("text").cast("binary"))))
        .alias("n_exact_dupes"),
        F.sum((n_words >= GOPHER_MIN_WORDS).cast("bigint")).alias("n_pass_min_words"),
    )


# -- Zipf rank-frequency fit -------------------------------------------------

ZIPF_TOP = 200
ZIPF_SCALE = 1_000_000  # ln values quantize to micro-units → exact int sums


@register(
    "x_text_zipf",
    "Zipf's-law fit over the corpus vocabulary: whitespace token "
    "counts (one explode + one partial-aggregated shuffle), top-200 "
    "types by (count desc, token) — a TakeOrdered top-k, never a "
    "global sort — then the OLS slope of ln(freq) on ln(rank). A "
    "natural-text corpus fits slope ≈ -1; synthetic or heavily "
    "templated text bends the tail, making the slope a corpus-level "
    "quality screen. ln terms quantize to micro-units so the five "
    "regression sums are exact BIGINTs (order-free); the slope "
    "division is one deterministic float op on exact inputs.",
    f"""WITH tok AS (
         SELECT unnest(string_split_regex(trim(text), '\\s+')) AS t
         FROM documents
       ),
       cnt AS (SELECT t, COUNT(*) AS c FROM tok WHERE t <> '' GROUP BY t),
       top AS (
         SELECT t, c, ROW_NUMBER() OVER (ORDER BY c DESC, t) AS r
         FROM cnt ORDER BY c DESC, t LIMIT {ZIPF_TOP}
       ),
       q AS (
         SELECT CAST(round(ln(r) * {ZIPF_SCALE}) AS BIGINT) AS xq,
                CAST(round(ln(c) * {ZIPF_SCALE}) AS BIGINT) AS yq
         FROM top
       ),
       s AS (
         SELECT COUNT(*) AS n,
                CAST(SUM(xq) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy,
                CAST(SUM(xq * yq) AS BIGINT) AS sxy,
                CAST(SUM(xq * xq) AS BIGINT) AS sxx
         FROM q
       )
       SELECT n,
              (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                AS zipf_slope
       FROM s""",
)
def q_zipf(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table_for_compute(spark, "documents", sf)
    tok = docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("t")
    ).filter(F.col("t") != "")
    cnt = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    top = cnt.orderBy(F.desc("c"), F.asc("t")).limit(ZIPF_TOP)
    from pyspark.sql.window import Window

    # rank over the 200 collected-to-one-task survivors (constant-size)
    r = F.row_number().over(Window.orderBy(F.desc("c"), F.asc("t")))
    q = top.select(
        F.round(F.log(r.cast("double")) * ZIPF_SCALE, 0).cast("bigint").alias("xq"),
        F.round(F.log(F.col("c").cast("double")) * ZIPF_SCALE, 0)
        .cast("bigint")
        .alias("yq"),
    )
    s = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xq").cast("bigint").alias("sx"),
        F.sum("yq").cast("bigint").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).cast("bigint").alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).cast("bigint").alias("sxx"),
    )
    n_d = F.col("n").cast("double")
    return s.select(
        "n",
        (
            (n_d * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
            / (n_d * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        ).alias("zipf_slope"),
    )


# -- Kneser-Ney smoothed bigram LM -------------------------------------------

KN_DISCOUNT_X4 = 3  # D = 0.75 expressed as 3/4 — exact in binary doubles
KN_TOP = 50


@register(
    "x_text_kneser_ney",
    "Interpolated Kneser-Ney bigram probabilities — the smoothing "
    "actually used by n-gram quality-filter LMs (raw conditional "
    "P(w2|w1), x_text_bigram_lm, assigns zero mass to unseen pairs; "
    "KN discounts every seen bigram by D=0.75 and backs off to the "
    "CONTINUATION unigram — how many contexts a word follows, not how "
    "often it occurs). Everything derives from ONE bigram-count "
    "shuffle: context totals, per-context type counts, continuation "
    "counts and the global bigram-type total are all tiny "
    "re-aggregations of that table, broadcast back. D=3/4 is exact in "
    "binary, so the per-row float is a deterministic function of "
    "exact integer counts.",
    f"""WITH w AS (
         SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
       ),
       bg AS (
         SELECT unnest(list_transform(range(1, len(ws)),
                                      i -> ws[i] || ' ' || ws[i+1])) AS g,
                unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
                unnest(list_transform(range(1, len(ws)), i -> ws[i+1])) AS w2
         FROM w WHERE len(ws) >= 2
       ),
       bgc AS (SELECT w1, w2, g, COUNT(*) AS c FROM bg GROUP BY w1, w2, g),
       ctx AS (
         SELECT w1, CAST(SUM(c) AS BIGINT) AS cw1,
                COUNT(*) AS n_types_after
         FROM bgc GROUP BY w1
       ),
       cont AS (SELECT w2, COUNT(*) AS n_contexts_before FROM bgc GROUP BY w2),
       tot AS (SELECT COUNT(*) AS n_bigram_types FROM bgc)
       SELECT bgc.g AS bigram, bgc.c AS cnt,
              (CAST(bgc.c AS DOUBLE) - {KN_DISCOUNT_X4}.0 / 4) / ctx.cw1
              + ({KN_DISCOUNT_X4}.0 / 4) * ctx.n_types_after / ctx.cw1
                * (CAST(cont.n_contexts_before AS DOUBLE) / tot.n_bigram_types)
                AS p_kn
       FROM bgc JOIN ctx ON bgc.w1 = ctx.w1
                JOIN cont ON bgc.w2 = cont.w2
                CROSS JOIN tot
       ORDER BY cnt DESC, bigram LIMIT {KN_TOP}""",
)
def text_kneser_ney(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table_for_compute(spark, "documents", sf)
    ws = F.split(F.trim("text"), " ")
    pairs = (
        docs.filter(F.size(ws) >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.slice(ws, 1, F.size(ws) - 1),
                    F.slice(ws, 2, F.size(ws) - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("z")
        )
        .select("z.w1", "z.w2")
    )
    # the bigram string g == w1 || ' ' || w2 by construction, so it does
    # NOT ride the corpus-sized exchange (it duplicated both words —
    # ~40% of the shuffled bytes) and is rebuilt vocab²-sized in the
    # final projection (r11: sf1 2.30 -> 1.85 s)
    bgc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    # every smoothing statistic is a re-aggregation of the bigram table —
    # the corpus is exploded and shuffled exactly once
    bgc = bgc.transform(pin_branch_point)
    ctx = bgc.groupBy("w1").agg(
        F.sum("cnt").cast("bigint").alias("cw1"),
        F.count(F.lit(1)).alias("n_types_after"),
    )
    cont = bgc.groupBy("w2").agg(F.count(F.lit(1)).alias("n_contexts_before"))
    tot = bgc.agg(F.count(F.lit(1)).alias("n_bigram_types"))
    d = F.lit(KN_DISCOUNT_X4 / 4.0)
    p_kn = (
        (F.col("cnt").cast("double") - d) / F.col("cw1")
        + d * F.col("n_types_after") / F.col("cw1")
        * (F.col("n_contexts_before").cast("double") / F.col("n_bigram_types"))
    )
    return (
        bgc.join(F.broadcast(ctx), "w1")
        .join(F.broadcast(cont), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"), "cnt", p_kn.alias("p_kn")
        )
        .orderBy(F.col("cnt").desc(), "bigram")
        .limit(KN_TOP)
    )


# -- BPE tokenizer training: merge-pair counting -----------------------------

BPE_TOP_PAIRS = 30


@register(
    "x_text_bpe_pairs",
    "The inner loop of BPE tokenizer training at corpus scale: count "
    "adjacent symbol pairs inside whitespace words (character level — "
    "the state of round 0, before any merge), rank by frequency. The "
    "top pair IS the next BPE merge rule; iterating this counting job "
    "with a growing merge table is exactly how corpus-scale "
    "tokenizers are trained. One explode to (pair) rows with map-side "
    "partial counts — the corpus shuffles pair-count partials, never "
    "raw text; TakeOrdered keeps the driver k-row-bounded. Word "
    "boundaries never pair (standard BPE pre-tokenization).",
    f"""WITH w AS (
         SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
         FROM documents
       ),
       p AS (
         SELECT unnest(list_transform(
                  range(1, length(word)),
                  i -> substr(word, i, 1) || ' ' || substr(word, i + 1, 1)
                )) AS pair
         FROM w WHERE length(word) >= 2
       )
       SELECT pair, COUNT(*) AS n
       FROM p GROUP BY pair
       ORDER BY n DESC, pair LIMIT {BPE_TOP_PAIRS}""",
)
def text_bpe_pairs(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table_for_compute(spark, "documents", sf)
    words = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("word")
    ).filter(F.length("word") >= 2)
    # Heaps'-law rollup: word INSTANCES grow linearly with the corpus
    # but the distinct vocabulary grows ~n^0.5, so collapsing to
    # (word, count) before pair generation shrinks the explode volume
    # by orders of magnitude (sf1: ~25 M instances -> ~10^5 distinct
    # words; measured 32.6 s -> explode over the vocabulary only).
    # Every real BPE trainer does exactly this (word-frequency table,
    # then weighted pair counts). The pair count is then SUM(word
    # count), not COUNT(*).
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("wn"))
    # expr form: the DataFrame API's substring takes Python ints only,
    # and the pair position is a per-element lambda variable
    pairs = vocab.selectExpr(
        "wn",
        "explode(transform(sequence(1, length(word) - 1),"
        " i -> concat(substr(word, i, 1), ' ', substr(word, i + 1, 1)))) as pair",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wn").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(BPE_TOP_PAIRS)
    )


# -- sliding-window chunking (RAG / long-context prep) -----------------------

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


@register(
    "x_text_chunk_windows",
    "Sliding-window chunking for retrieval / long-context prep: each "
    "document splits into 64-token windows with stride 48 (16-token "
    "overlap), the shape every RAG index and long-context packer "
    "ingests. Chunk generation is a per-row sequence/transform "
    "expression — zero shuffle, chunk rows never exist before the "
    "explode in the same codegen stage; the per-doc rollup "
    "(n_chunks, boundary digests) partially aggregates. Chunk count "
    "and per-chunk token math are pure integer functions of the token "
    "count.",
    f"""WITH t AS (
         SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
         FROM documents
       ),
       c AS (
         SELECT doc_id, len(ws) AS n_tok, u.s AS start_tok,
                array_to_string(ws[u.s + 1 : u.s + {CHUNK_TOKENS}], ' ') AS chunk
         FROM t CROSS JOIN (
           SELECT unnest(range(0, 2000, {CHUNK_STRIDE})) AS s
         ) u
         WHERE u.s < len(ws) AND (u.s = 0 OR u.s + {CHUNK_TOKENS} <= len(ws)
                                  + {CHUNK_STRIDE} - 1)
       )
       SELECT doc_id, n_tok, COUNT(*) AS n_chunks,
              CAST(SUM(length(chunk)) AS BIGINT) AS sum_chunk_chars,
              md5(string_agg(chunk, '|' ORDER BY start_tok)) AS chunks_digest
       FROM c GROUP BY doc_id, n_tok
       ORDER BY doc_id LIMIT 300""",
)
def text_chunk_windows(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table_for_compute(spark, "documents", sf)
    t = docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("ws"))
    c = t.selectExpr(
        "doc_id",
        "size(ws) as n_tok",
        f"""explode(transform(
              filter(sequence(0, 1999, {CHUNK_STRIDE}),
                     s -> s < size(ws) AND (s = 0 OR s + {CHUNK_TOKENS}
                                            <= size(ws) + {CHUNK_STRIDE} - 1)),
              s -> struct(s as start_tok,
                          array_join(slice(ws, s + 1, {CHUNK_TOKENS}), ' ')
                            as chunk))) as w""",
    ).select("doc_id", "n_tok", "w.start_tok", "w.chunk")
    return (
        c.groupBy("doc_id", "n_tok")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.length("chunk")).cast("bigint").alias("sum_chunk_chars"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("start_tok", "chunk"))
                        ),
                        lambda s: s["chunk"],
                    ),
                    "|",
                ).cast("binary")
            ).alias("chunks_digest"),
        )
        .orderBy("doc_id")
        .limit(300)
    )


# -- readability scoring -----------------------------------------------------


@register(
    "x_text_readability",
    "Flesch-Kincaid grade-level estimate per document: sentences from "
    "terminal punctuation, words from whitespace, syllables from "
    "vowel-group runs — the century-old readability heuristic quality "
    "pipelines still use as a complexity gate (too-low grade = "
    "template spam, too-high = OCR noise). Pure per-row regexp/count "
    "codegen expressions, zero shuffle before the TakeOrdered slice; "
    "the grade is one float expression over three exact integer "
    "counts.",
    """WITH c AS (
         SELECT doc_id,
                GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS n_sent,
                len(string_split_regex(trim(text), '\\s+')) AS n_words,
                GREATEST(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
                  AS n_syll
         FROM documents
       )
       SELECT doc_id, CAST(n_sent AS BIGINT) AS n_sent,
              CAST(n_words AS BIGINT) AS n_words,
              CAST(n_syll AS BIGINT) AS n_syll,
              0.39 * (CAST(n_words AS DOUBLE) / n_sent)
                + 11.8 * (CAST(n_syll AS DOUBLE) / n_words) - 15.59 AS fk_grade
       FROM c ORDER BY doc_id LIMIT 300""",
)
def text_readability(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table_for_compute(spark, "documents", sf)
    n_sent = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit("[.!?]+"), 0)), F.lit(1)
    )
    n_words = F.size(F.split(F.trim("text"), r"\s+"))
    n_syll = F.greatest(
        F.size(F.regexp_extract_all(F.lower("text"), F.lit("[aeiouy]+"), 0)),
        F.lit(1),
    )
    c = docs.select(
        "doc_id",
        n_sent.cast("bigint").alias("n_sent"),
        n_words.cast("bigint").alias("n_words"),
        n_syll.cast("bigint").alias("n_syll"),
    )
    grade = (
        0.39 * (F.col("n_words").cast("double") / F.col("n_sent"))
        + 11.8 * (F.col("n_syll").cast("double") / F.col("n_words"))
        - 15.59
    )
    return (
        c.select("doc_id", "n_sent", "n_words", "n_syll", grade.alias("fk_grade"))
        .orderBy("doc_id")
        .limit(300)
    )


# -- Jensen-Shannon divergence between language character profiles -----------

JS_LANG_A, JS_LANG_B = "en", "de"
JS_SCALE = 1_000_000_000


@register(
    "x_text_js_divergence",
    "Jensen-Shannon divergence between two languages' character "
    "distributions — the symmetric, bounded [0, ln 2] corpus-drift "
    "metric (PSI's cousin without its zero-bucket blowups), the "
    "standard check that two corpus slices are 'the same kind of "
    "text'. One explode to per-char conditional counts with map-side "
    "partials (grouping by char alone IS the full-outer row set: a "
    "one-sided character reads count 0 on the other side); the "
    "alphabet is type-bounded, so both language totals are window "
    "sums over the coalesced single partition — no joins anywhere; "
    "per-character KL terms quantize to nano-nats and sum as exact "
    "integers.",
    f"""WITH ch AS (
         SELECT lang, unnest(string_split_regex(lower(text), '')) AS c
         FROM documents WHERE lang IN ('{JS_LANG_A}', '{JS_LANG_B}')
       ),
       cnt AS (
         SELECT lang, c, COUNT(*) AS n FROM ch WHERE c <> '' GROUP BY lang, c
       ),
       tot AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS t FROM cnt GROUP BY lang),
       p AS (
         SELECT cnt.c,
                CAST(cnt.n AS DOUBLE) / tot.t AS p,
                cnt.lang
         FROM cnt JOIN tot ON cnt.lang = tot.lang
       ),
       w AS (
         SELECT COALESCE(a.c, b.c) AS c,
                COALESCE(a.p, 0) AS pa, COALESCE(b.p, 0) AS pb,
                (COALESCE(a.p, 0) + COALESCE(b.p, 0)) / 2 AS m
         FROM (SELECT c, p FROM p WHERE lang = '{JS_LANG_A}') a
         FULL OUTER JOIN (SELECT c, p FROM p WHERE lang = '{JS_LANG_B}') b
           ON a.c = b.c
       ),
       terms AS (
         SELECT c,
                CAST(round((CASE WHEN pa > 0
                                 THEN pa * ln(pa / m) ELSE 0 END / 2
                          + CASE WHEN pb > 0
                                 THEN pb * ln(pb / m) ELSE 0 END / 2)
                           * {JS_SCALE}) AS BIGINT) AS t_q
         FROM w
       )
       SELECT COUNT(*) AS n_chars,
              CAST(SUM(t_q) AS BIGINT) AS js_nanonats,
              CAST(SUM(t_q) AS DOUBLE) / {JS_SCALE} AS js_divergence
       FROM terms""",
)
def text_js_divergence(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table_for_compute(spark, "documents", sf).filter(
        F.col("lang").isin(JS_LANG_A, JS_LANG_B)
    )
    ch = docs.select(
        "lang", F.explode(F.split(F.lower("text"), "")).alias("c")
    ).filter(F.col("c") != "")
    # Per-char conditional counts replace the (lang, c) table + its
    # full-outer self-join: grouping by c alone yields exactly the
    # full-outer row set (a char missing on one side reads count 0 =
    # COALESCE(p, 0)), and the alphabet is type-bounded, so the two
    # language totals are window sums over the coalesced single
    # partition — one fact shuffle, no checkpoint, no SortMergeJoins
    # (r10 shape: pin + tot broadcast + 2-exchange full-outer SMJ;
    # sf0.1 interleaved medians 1.24 s -> 0.78 s).
    cells = (
        ch.groupBy("c")
        .agg(
            F.sum(F.when(F.col("lang") == JS_LANG_A, 1).otherwise(0)).alias("na"),
            F.sum(F.when(F.col("lang") == JS_LANG_B, 1).otherwise(0)).alias("nb"),
        )
        .coalesce(1)
    )
    wt = Window.partitionBy()
    w = (
        cells.withColumn("ta", F.sum("na").over(wt).cast("bigint"))
        .withColumn("tb", F.sum("nb").over(wt).cast("bigint"))
        .withColumn("pa", F.col("na").cast("double") / F.col("ta"))
        .withColumn("pb", F.col("nb").cast("double") / F.col("tb"))
        .withColumn("m", (F.col("pa") + F.col("pb")) / 2)
    )
    term = (
        F.when(F.col("pa") > 0, F.col("pa") * F.log(F.col("pa") / F.col("m"))).otherwise(0.0) / 2
        + F.when(F.col("pb") > 0, F.col("pb") * F.log(F.col("pb") / F.col("m"))).otherwise(0.0) / 2
    )
    terms = w.select(F.round(term * JS_SCALE, 0).cast("bigint").alias("t_q"))
    return terms.agg(
        F.count(F.lit(1)).alias("n_chars"),
        F.sum("t_q").cast("bigint").alias("js_nanonats"),
        (F.sum("t_q").cast("double") / JS_SCALE).alias("js_divergence"),
    )


# -- Heaps' law: vocabulary growth -------------------------------------------

HEAPS_CHECKPOINTS = (100, 200, 300, 400, 500)
HEAPS_SCALE = 1_000_000


@register(
    "x_text_heaps",
    "Heaps'-law fit: vocabulary size V(n) at growing corpus prefixes, "
    "then the log-log slope beta (V ~ K * n^beta; natural text sits "
    "near 0.4-0.6 — a flat curve means the corpus is template spam, "
    "a near-linear one means unbounded noise/IDs). All prefix "
    "vocabularies come from ONE Expand-based multi-distinct pass "
    "(each checkpoint is a conditional COUNT DISTINCT over doc_id < "
    "N); the regression runs on the 5-point profile with quantized "
    "exact sums, companion to x_text_zipf.",
    f"""WITH tok AS (
         SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
         FROM documents WHERE doc_id < {max(HEAPS_CHECKPOINTS)}
       ),
       v AS (
         SELECT {", ".join(
             f"COUNT(DISTINCT CASE WHEN doc_id < {n} AND t <> '' THEN t END) AS v_{n},"
             f" CAST(SUM(CASE WHEN doc_id < {n} AND t <> '' THEN 1 ELSE 0 END) AS BIGINT) AS n_{n}"
             for n in HEAPS_CHECKPOINTS
         )}
         FROM tok
       ),
       pts(nt, vt) AS (
         {" UNION ALL ".join(
             f"SELECT (SELECT n_{n} FROM v), (SELECT v_{n} FROM v)"
             for n in HEAPS_CHECKPOINTS
         )}
       ),
       q AS (
         SELECT CAST(round(ln(nt) * {HEAPS_SCALE}) AS BIGINT) AS xq,
                CAST(round(ln(vt) * {HEAPS_SCALE}) AS BIGINT) AS yq
         FROM pts
       ),
       s AS (
         SELECT COUNT(*) AS k,
                CAST(SUM(xq) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy,
                CAST(SUM(xq * yq) AS BIGINT) AS sxy,
                CAST(SUM(xq * xq) AS BIGINT) AS sxx
         FROM q
       )
       SELECT k,
              (CAST(k AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                / (CAST(k AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                AS heaps_beta
       FROM s""",
)
def text_heaps(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table_for_compute(spark, "documents", sf).filter(
        F.col("doc_id") < max(HEAPS_CHECKPOINTS)
    )
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("t")
    )
    aggs = []
    for n in HEAPS_CHECKPOINTS:
        keep = (F.col("doc_id") < n) & (F.col("t") != "")
        aggs.append(
            F.count_distinct(F.when(keep, F.col("t"))).alias(f"v_{n}")
        )
        aggs.append(F.sum(keep.cast("bigint")).cast("bigint").alias(f"n_{n}"))
    v = tok.agg(*aggs)
    pts = v.selectExpr(
        "inline(array({}))".format(
            ", ".join(
                f"struct(cast(n_{n} as double) as nt, cast(v_{n} as double) as vt)"
                for n in HEAPS_CHECKPOINTS
            )
        )
    )
    q = pts.select(
        F.round(F.log("nt") * HEAPS_SCALE, 0).cast("bigint").alias("xq"),
        F.round(F.log("vt") * HEAPS_SCALE, 0).cast("bigint").alias("yq"),
    )
    s = q.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("xq").cast("bigint").alias("sx"),
        F.sum("yq").cast("bigint").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).cast("bigint").alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).cast("bigint").alias("sxx"),
    )
    k_d = F.col("k").cast("double")
    return s.select(
        "k",
        (
            (k_d * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
            / (k_d * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        ).alias("heaps_beta"),
    )


# -- structural template fingerprinting --------------------------------------

TEMPLATE_TOP = 20
TEMPLATE_CAP = 9  # word lengths cap at one digit so the shape string is stable


@register(
    "x_text_template_fingerprint",
    "Structural template detection: each document's SHAPE — the "
    f"sequence of word lengths capped at {TEMPLATE_CAP}, concatenated "
    "and md5'd — fingerprints boilerplate/generated templates that "
    "exact and near-dup passes miss (different words, same skeleton: "
    "form letters, SEO spam, log lines). One zero-shuffle codegen "
    "projection to the fingerprint, one digest-keyed partial-agg "
    "shuffle, TakeOrdered head — the x_dedup_exact plan shape applied "
    "to structure instead of content.",
    f"""WITH s AS (
         SELECT doc_id,
                md5(array_to_string(list_transform(
                  string_split(text, ' '),
                  w -> CAST(LEAST(strlen(w), {TEMPLATE_CAP}) AS VARCHAR)
                ), '')) AS shape,
                len(string_split(text, ' ')) AS n_words
         FROM documents
       )
       SELECT shape, COUNT(*) AS n_docs,
              CAST(MIN(doc_id) AS BIGINT) AS first_doc,
              CAST(MIN(n_words) AS BIGINT) AS n_words
       FROM s GROUP BY shape
       ORDER BY n_docs DESC, shape LIMIT {TEMPLATE_TOP}""",
)
def q_template_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table_for_compute(spark, "documents", sf)
    shape = F.md5(
        F.expr(
            f"cast(array_join(transform(split(text, ' '), "
            f"w -> CAST(LEAST(length(w), {TEMPLATE_CAP}) AS STRING)), '') as binary)"
        )
    )
    return (
        docs.select(
            "doc_id",
            shape.alias("shape"),
            F.size(F.split(F.col("text"), " ")).alias("n_words"),
        )
        .groupBy("shape")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
            F.min("n_words").cast("bigint").alias("n_words"),
        )
        .orderBy(F.col("n_docs").desc(), "shape")
        .limit(TEMPLATE_TOP)
    )


# -- trigram novelty scoring -------------------------------------------------

NOVELTY_DOCS = 100


@register(
    "x_text_trigram_novelty",
    "Per-document novelty score: the fraction of a document's distinct "
    "trigrams whose FIRST corpus occurrence (minimum doc_id) is this "
    "document — the contribution-gain signal dedup-aware curation uses "
    "to rank near-redundant documents for dropping. The shingle stream "
    "shuffles once to (shingle -> first_doc) with map-side MIN "
    "partials, then re-joins the per-doc stream; ratios quantize to "
    "1e-6 integer floor-division so every emitted number is exact.",
    f"""WITH sh AS (
         SELECT doc_id, unnest(list_distinct(list_transform(
                  range(1, len(string_split(text, ' ')) - 1),
                  i -> string_split(text, ' ')[i] || ' ' ||
                       string_split(text, ' ')[i+1] || ' ' ||
                       string_split(text, ' ')[i+2]
                ))) AS s
         FROM documents
       ),
       first AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s),
       d AS (
         SELECT sh.doc_id,
                COUNT(*) AS n_grams,
                SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
                  AS novel
         FROM sh JOIN first f ON sh.s = f.s
         GROUP BY sh.doc_id
       )
       SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
              CAST(novel AS BIGINT) AS novel,
              CAST((novel * 1000000) // n_grams AS BIGINT) AS novelty_q6
       FROM d WHERE doc_id < {NOVELTY_DOCS} ORDER BY doc_id""",
)
def q_trigram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    from geostore_spark.operators.dedup import shingle_rows

    docs = load_table_for_compute(spark, "documents", sf)
    # MIN(doc_id) OVER (PARTITION BY s) consumes the shingle stream
    # ONCE — the former (pin → groupBy(s) → re-join) shape paid a
    # localCheckpoint write plus a second shingle-keyed exchange and
    # SMJ sort to re-attach the first-doc table to the very stream it
    # came from (the repeat_rate/cohort_ltv window lever, r11 item 4).
    # One shingle-keyed exchange, one doc-keyed exchange, no pin.
    sh = shingle_rows(docs, "doc_id", "text", 3)
    d = (
        sh.withColumn(
            "first_doc", F.min("doc_id").over(Window.partitionBy("s"))
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("novel"),
        )
    )
    return d.filter(F.col("doc_id") < NOVELTY_DOCS).select(
        "doc_id",
        F.col("n_grams").cast("bigint").alias("n_grams"),
        F.col("novel").cast("bigint").alias("novel"),
        F.expr("novel * 1000000 div n_grams").cast("bigint").alias("novelty_q6"),
    ).orderBy("doc_id")


# -- filter ablation accounting ----------------------------------------------


@register(
    "x_pipeline_filter_ablation",
    "Quality-rule ablation report: for each Gopher-style gate (word "
    "count, mean word length, stop-word minimum) — how many documents "
    "it kills, how many it UNIQUELY kills (no other rule fires), and "
    "the all-pass yield. The marginal-kill numbers are what a curation "
    "team reads before relaxing a rule. One zero-shuffle codegen "
    "projection of the three booleans, one global aggregate with "
    "map-side partials; no per-rule passes.",
    f"""WITH d AS (
         SELECT doc_id,
                len(string_split(text, ' ')) AS n_words,
                length(text) AS n_chars,
                len(list_filter(string_split(text, ' '),
                    w -> w IN {GOPHER_STOPS!r})) AS stop_hits
         FROM documents
       ),
       r AS (
         SELECT
           (n_words < {GOPHER_MIN_WORDS} OR n_words > {GOPHER_MAX_WORDS})
             AS kill_words,
           (CAST(n_chars - n_words + 1 AS DOUBLE) / n_words
              < {GOPHER_MIN_MEAN_WLEN}
            OR CAST(n_chars - n_words + 1 AS DOUBLE) / n_words
              > {GOPHER_MAX_MEAN_WLEN}) AS kill_wlen,
           (stop_hits < {GOPHER_MIN_STOP_HITS}) AS kill_stop
         FROM d
       )
       SELECT COUNT(*) AS n_docs,
              CAST(SUM(CASE WHEN kill_words THEN 1 ELSE 0 END) AS BIGINT)
                AS killed_by_words,
              CAST(SUM(CASE WHEN kill_wlen THEN 1 ELSE 0 END) AS BIGINT)
                AS killed_by_wlen,
              CAST(SUM(CASE WHEN kill_stop THEN 1 ELSE 0 END) AS BIGINT)
                AS killed_by_stop,
              CAST(SUM(CASE WHEN kill_words AND NOT kill_wlen
                             AND NOT kill_stop THEN 1 ELSE 0 END) AS BIGINT)
                AS unique_words,
              CAST(SUM(CASE WHEN kill_wlen AND NOT kill_words
                             AND NOT kill_stop THEN 1 ELSE 0 END) AS BIGINT)
                AS unique_wlen,
              CAST(SUM(CASE WHEN kill_stop AND NOT kill_words
                             AND NOT kill_wlen THEN 1 ELSE 0 END) AS BIGINT)
                AS unique_stop,
              CAST(SUM(CASE WHEN NOT kill_words AND NOT kill_wlen
                             AND NOT kill_stop THEN 1 ELSE 0 END) AS BIGINT)
                AS pass_all
       FROM r""",
)
def q_filter_ablation(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table_for_compute(spark, "documents", sf)
    stops = ", ".join(f"'{s}'" for s in GOPHER_STOPS)
    d = docs.select(
        F.size(F.split(F.col("text"), " ")).alias("n_words"),
        F.length("text").alias("n_chars"),
        F.expr(f"size(filter(split(text, ' '), w -> w IN ({stops})))").alias(
            "stop_hits"
        ),
    )
    mean_wlen = (F.col("n_chars") - F.col("n_words") + 1).cast("double") / F.col(
        "n_words"
    )
    kw = (F.col("n_words") < GOPHER_MIN_WORDS) | (
        F.col("n_words") > GOPHER_MAX_WORDS
    )
    kl = (mean_wlen < GOPHER_MIN_MEAN_WLEN) | (mean_wlen > GOPHER_MAX_MEAN_WLEN)
    ks = F.col("stop_hits") < GOPHER_MIN_STOP_HITS
    r = d.select(kw.alias("kw"), kl.alias("kl"), ks.alias("ks"))

    def s(c):
        return F.sum(F.when(c, 1).otherwise(0)).cast("bigint")

    return r.agg(
        F.count(F.lit(1)).alias("n_docs"),
        s(F.col("kw")).alias("killed_by_words"),
        s(F.col("kl")).alias("killed_by_wlen"),
        s(F.col("ks")).alias("killed_by_stop"),
        s(F.col("kw") & ~F.col("kl") & ~F.col("ks")).alias("unique_words"),
        s(F.col("kl") & ~F.col("kw") & ~F.col("ks")).alias("unique_wlen"),
        s(F.col("ks") & ~F.col("kw") & ~F.col("kl")).alias("unique_stop"),
        s(~F.col("kw") & ~F.col("kl") & ~F.col("ks")).alias("pass_all"),
    )
