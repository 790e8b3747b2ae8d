"""TF-IDF, character entropy, and PII-redaction arithmetic on tiny corpora."""

from __future__ import annotations

import math

import pandas as pd

from geostore_spark.operators.text import text_entropy, text_pii_redact, text_tfidf


def _write_docs(tmp_path, texts):
    pd.DataFrame(
        {
            "doc_id": list(range(1, len(texts) + 1)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")


def test_tfidf_idf_and_ranking(spark, tmp_path):
    _write_docs(
        tmp_path,
        [
            "the the the apple",  # "apple" unique to doc 1
            "the banana banana",
            "the cherry",
        ],
    )
    rows = {
        (r["doc_id"], r["term"]): r.asDict()
        for r in text_tfidf(spark, str(tmp_path)).collect()
    }
    # "the" appears in all 3 docs -> idf = ln(3/3) = 0 -> tfidf 0
    assert rows[(1, "the")]["tfidf"] == 0.0
    assert rows[(1, "the")]["tf"] == 3 and rows[(1, "the")]["df"] == 3
    # "apple" tf=1, df=1 -> tfidf = ln(3)
    assert math.isclose(rows[(1, "apple")]["tfidf"], math.log(3.0), rel_tol=1e-12)
    # "banana" tf=2, df=1 -> 2*ln(3)
    assert math.isclose(rows[(2, "banana")]["tfidf"], 2 * math.log(3.0), rel_tol=1e-12)


def test_entropy_known_distributions(spark, tmp_path):
    _write_docs(tmp_path, ["aaaa", "ab", "aabb"])
    rows = {r["doc_id"]: r.asDict() for r in text_entropy(spark, str(tmp_path)).collect()}
    assert math.isclose(rows[1]["entropy"], 0.0, abs_tol=1e-6)
    assert rows[1]["n_distinct"] == 1
    # uniform over 2 symbols -> ln 2 (quantized term sum: error <= 1e-6/char)
    assert math.isclose(rows[2]["entropy"], math.log(2.0), abs_tol=1e-5)
    assert math.isclose(rows[3]["entropy"], math.log(2.0), abs_tol=1e-5)
    assert rows[3]["n_chars"] == 4


def test_pii_detects_and_redacts(spark, tmp_path):
    pd.DataFrame(
        {
            "c_custkey": [7, 42],
            "c_name": ["Customer#000000007", "Customer#000000042"],
            "c_nationkey": [1, 2],
            "c_acctbal": [0.0, 0.0],
            "c_mktsegment": ["BUILDING", "MACHINERY"],
        }
    ).to_parquet(tmp_path / "customer.parquet")
    rows = {r["c_custkey"]: r.asDict() for r in text_pii_redact(spark, str(tmp_path)).collect()}
    for key in (7, 42):
        assert rows[key]["n_email"] == 1 and rows[key]["n_phone"] == 1
        assert "[EMAIL]" in rows[key]["redacted"]
        assert "[PHONE]" in rows[key]["redacted"]
        assert "@example.com" not in rows[key]["redacted"]
        assert "+1-" not in rows[key]["redacted"]
    assert rows[7]["redacted"].startswith("Customer#000000007 <[EMAIL]> [PHONE]")


def test_bigram_lm_counts_and_conditionals(spark, tmp_path):
    _write_docs(tmp_path, ["a b a b", "a b c"])
    from geostore_spark.operators.text import text_bigram_lm

    rows = {r["bigram"]: r.asDict() for r in text_bigram_lm(spark, str(tmp_path)).collect()}
    # "a b" occurs 3x; context "a ." occurs 3x -> P(b|a) = 1.0
    assert rows["a b"]["cnt"] == 3 and rows["a b"]["p_cond"] == 1.0
    # "b a" 1x and "b c" 1x out of 2 "b ." contexts
    assert rows["b a"]["cnt"] == 1 and rows["b a"]["context_cnt"] == 2
    assert math.isclose(rows["b c"]["p_cond"], 0.5)


def test_emb_quantize_digests(spark, tmp_path):
    import numpy as np

    pd.DataFrame(
        {
            "vec_id": [1, 2],
            "embedding": [
                np.array([0.5, -0.25, 0.0], dtype=np.float32),
                np.array([0.0, 0.0, 0.0], dtype=np.float32),  # zero vector
            ],
            "label": [0, 0],
        }
    ).to_parquet(tmp_path / "embeddings.parquet")
    from geostore_spark.operators.embeddings import emb_quantize

    rows = {r["vec_id"]: r.asDict() for r in emb_quantize(spark, str(tmp_path)).collect()}
    # codes for [0.5, -0.25, 0]: scale 0.5 -> [127, -64 (round(-63.5) away), 0]
    assert rows[1]["max_abs"] == 0.5
    assert rows[1]["n_sat"] == 1
    assert rows[1]["sum_q"] == 127 - 64
    assert rows[1]["sum_q2"] == 127 * 127 + 64 * 64
    # zero vector: scale 0 -> NULL digests, never a division crash
    assert rows[2]["max_abs"] == 0.0 and rows[2]["sum_q"] is None


def test_canonical_url_cases(spark):
    from geostore_spark.operators.dedup import canonical_url

    cases = [
        ("HTTPS://WWW.Example.COM/Items/7", "https://www.example.com/Items/7"),
        ("https://www.example.com:443/a", "https://www.example.com/a"),
        ("https://x.org/a?utm_source=feed", "https://x.org/a"),
        ("https://x.org/a?id=3", "https://x.org/a?id=3"),  # real params survive
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    from pyspark.sql import functions as F

    got = [r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_decontaminate_flags_overlapping_train_docs(spark, tmp_path):
    # doc 10 is "benchmark" (doc_id % 10 == 0); docs 1 and 3 copy an
    # 8-gram from it, doc 2 shares nothing.
    bench = "w1 w2 w3 w4 w5 w6 w7 w8 tail words here"
    _write_docs_ids(
        tmp_path,
        {
            10: bench,
            1: "prefix w1 w2 w3 w4 w5 w6 w7 w8 suffix",
            2: "totally different content with no overlap at all whatsoever",
            3: "w1 w2 w3 w4 w5 w6 w7 w8",
        },
    )
    from geostore_spark.operators.text import text_decontaminate

    rows = {
        r["doc_id"]: r.asDict()
        for r in text_decontaminate(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {1, 3}
    assert rows[1]["n_shared_grams"] == 1 and rows[1]["n_bench_docs"] == 1
    assert rows[3]["n_shared_grams"] == 1


def _write_docs_ids(tmp_path, by_id):
    pd.DataFrame(
        {
            "doc_id": list(by_id),
            "text": list(by_id.values()),
            "lang": ["en"] * len(by_id),
            "source": ["s"] * len(by_id),
            "n_chars": [len(t) for t in by_id.values()],
        }
    ).to_parquet(tmp_path / "documents.parquet")


def test_chunk_dedup_first_occurrence_wins(spark, tmp_path):
    # 16-word chunk A appears in docs 1, 2 and twice in doc 3; first
    # occurrence is (doc 1, pos 0), every other copy counts as dup.
    chunk_a = " ".join(f"a{i}" for i in range(16))
    chunk_b = " ".join(f"b{i}" for i in range(16))
    _write_docs_ids(
        tmp_path,
        {
            1: chunk_a + " " + chunk_b,
            2: chunk_a,
            3: chunk_a + " " + chunk_a,
        },
    )
    from geostore_spark.operators.dedup import q_chunk_dedup

    rows = {r["doc_id"]: r.asDict() for r in q_chunk_dedup(spark, str(tmp_path)).collect()}
    assert rows[1] == {"doc_id": 1, "n_chunks": 2, "n_dup_chunks": 0}
    assert rows[2] == {"doc_id": 2, "n_chunks": 1, "n_dup_chunks": 1}
    assert rows[3] == {"doc_id": 3, "n_chunks": 2, "n_dup_chunks": 2}


def test_containment_detects_doc_in_doc(spark, tmp_path):
    # doc 1 (8 words, 6 trigrams) fully inside doc 2 (28 words): A->B
    # containment = 1.0 while Jaccard ≈ 6/26 is far below any dup bar;
    # doc 3 shares nothing.
    small = " ".join(f"a{i}" for i in range(8))
    big = small + " " + " ".join(f"b{i}" for i in range(20))
    _write_docs_ids(tmp_path, {1: small, 2: big, 3: "x y z w v u"})
    from geostore_spark.operators.dedup import q_containment

    rows = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in q_containment(spark, str(tmp_path)).collect()
    }
    assert rows == {(1, 2): 1.0}


def test_perplexity_known_lm(spark, tmp_path):
    # corpus bigrams from 'a': 3x 'a b', 1x 'a c' -> P(b|a)=3/4, P(c|a)=1/4
    _write_docs_ids(tmp_path, {1: "a b", 2: "a b", 3: "a b", 4: "a c"})
    from geostore_spark.operators.text import text_perplexity

    rows = {r["doc_id"]: r.asDict() for r in text_perplexity(spark, str(tmp_path)).collect()}
    assert math.isclose(rows[1]["nll"], -math.log(0.75), abs_tol=1e-5)
    assert math.isclose(rows[4]["nll"], -math.log(0.25), abs_tol=1e-5)
    assert rows[1]["n_bigrams"] == 1
