"""Deterministic sampling properties and repetition-filter arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from geostore_spark.operators.sampling import sample_bucket, stratified_sample
from geostore_spark.operators.text import text_repetition  # noqa: F401  (registration)

ROWS = [(i, "en" if i % 3 else "zh") for i in range(300)]


def test_sample_is_deterministic_and_nested(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, lang string")
    kept_small = {
        r["doc_id"]
        for r in stratified_sample(
            df, F.col("doc_id"), F.col("lang"), {"en": 0.2, "zh": 0.5}
        ).collect()
    }
    kept_small_again = {
        r["doc_id"]
        for r in stratified_sample(
            df, F.col("doc_id"), F.col("lang"), {"en": 0.2, "zh": 0.5}
        ).collect()
    }
    kept_big = {
        r["doc_id"]
        for r in stratified_sample(
            df, F.col("doc_id"), F.col("lang"), {"en": 0.6, "zh": 0.9}
        ).collect()
    }
    assert kept_small == kept_small_again  # no rand(): same rows every run
    assert kept_small <= kept_big  # raising rates only grows the sample
    assert 0 < len(kept_small) < len(kept_big) < len(ROWS)


def test_sample_membership_independent_of_other_rows(spark):
    full = spark.createDataFrame(ROWS, "doc_id long, lang string")
    half = spark.createDataFrame(ROWS[::2], "doc_id long, lang string")
    rates = {"en": 0.3, "zh": 0.3}
    kept_full = {
        r["doc_id"]
        for r in stratified_sample(full, F.col("doc_id"), F.col("lang"), rates).collect()
    }
    kept_half = {
        r["doc_id"]
        for r in stratified_sample(half, F.col("doc_id"), F.col("lang"), rates).collect()
    }
    assert kept_half == {i for i in kept_full if i % 2 == 0}


def test_sample_bucket_range(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "k long")
    rows = df.select(sample_bucket(F.col("k")).alias("b")).collect()
    assert all(0 <= r["b"] < 10_000 for r in rows)


def test_sample_membership_independent_of_partitioning(spark):
    # the property a retried/re-shuffled 1000-executor job depends on:
    # a row's fate is a pure function of its key, never of task layout
    df = spark.createDataFrame(ROWS, "doc_id long, lang string")
    rates = {"en": 0.3, "zh": 0.4}

    def kept(frame):
        return {
            r["doc_id"]
            for r in stratified_sample(
                frame, F.col("doc_id"), F.col("lang"), rates
            ).collect()
        }

    assert (
        kept(df.coalesce(1))
        == kept(df.repartition(13))
        == kept(df.repartition(32, "lang"))
    )


def test_repetition_flags_degenerate_doc(spark, tmp_path):
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [
                "spam ham " * 30 + "spam ham",  # one bigram dominates
                " ".join(f"w{i}" for i in range(40)),  # all-distinct words
            ],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [0, 0],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    out = {r["doc_id"]: r.asDict() for r in text_repetition(spark, str(tmp_path)).collect()}
    assert out[1]["low_quality"] and out[1]["dup_word_frac"] > 0.9
    assert not out[2]["low_quality"] and out[2]["dup_word_frac"] == 0.0


def test_token_budget_fill_matches_naive_prefix_scan(spark, tmp_path):
    import hashlib

    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": range(60),
            "text": [" ".join(["w"] * (5 + i % 7)) for i in range(60)],
            "lang": ["en" if i % 2 else "zh" for i in range(60)],
            "source": ["s"] * 60,
            "n_chars": [0] * 60,
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    from geostore_spark.operators.sampling import token_budget_sample

    got = {
        r["doc_id"]: r.asDict()
        for r in token_budget_sample(
            spark.read.parquet(str(tmp_path / "documents.parquet")), budget=100
        ).collect()
    }
    # naive reference: per-lang md5-ordered prefix scan
    docs["toks"] = docs["text"].str.split(" ").map(len)
    docs["okey"] = docs["doc_id"].map(lambda d: hashlib.md5(str(d).encode()).hexdigest())
    expect = {}
    for _lang, grp in docs.groupby("lang"):
        cum = 0
        for _, row in grp.sort_values(["okey", "doc_id"]).iterrows():
            cum += row["toks"]
            if cum > 100:
                break
            expect[row["doc_id"]] = cum
    assert {k: v["cum"] for k, v in got.items()} == expect
    # the budget binds per language
    for lang in ("en", "zh"):
        assert sum(v["toks"] for v in got.values() if v["lang"] == lang) <= 100


def test_topk_hash_sample_exact_size_and_nested(spark):
    """Exact k rows, deterministic membership, and k'<k is a subset."""
    from geostore_spark.operators.sampling import q_topk_hash_sample

    sf = "/root/testdata/sf0.01"
    a = {r["doc_id"] for r in q_topk_hash_sample(spark, sf).collect()}
    b = {r["doc_id"] for r in q_topk_hash_sample(spark, sf).collect()}
    assert a == b and len(a) == 100
