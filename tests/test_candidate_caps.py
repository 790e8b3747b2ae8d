"""Candidate-density caps on the near-dup pair miners.

These knobs are the production guard for the one honest superlinearity
in BASELINE.md's slope tables: TRUE pair density in a dense corpus.
Default (None) is exact and hash-pinned by the registry oracles; these
tests pin the capped semantics — a generous cap changes nothing, a
tight cap drops exactly the hub-bucket / hub-token candidates.
"""

from __future__ import annotations

from itertools import combinations

from geostore_spark.operators.dedup import (
    HAMMING_MAX,
    SIMHASH_BANDS,
    ngram_containment_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

FPS = [
    (1, 0b1010_1100_0011_0101_1111_0000_1010_0001),
    (2, 0b1010_1100_0011_0101_1111_0000_1010_0000),  # d(1,2)=1
    (3, 0b1010_1100_0011_0101_1111_0000_0101_0001),  # d(1,3)=4
    (4, 0b0101_0011_1100_1010_0000_1111_0101_1110),  # far from all
    (5, 0b1010_1100_0011_0101_1111_0000_1010_0001),  # identical to 1
    (6, 0b1010_1100_0011_0111_1011_0000_1010_0001),  # d(1,6)=2
]


def _py_capped_pairs(cap: int | None) -> dict[tuple[int, int], int]:
    width = 32 // SIMHASH_BANDS
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc, fp in FPS:
        for b in range(SIMHASH_BANDS):
            buckets.setdefault((b, (fp >> (b * width)) & ((1 << width) - 1)), []).append(doc)
    fp_of = dict(FPS)
    out: dict[tuple[int, int], int] = {}
    for members in buckets.values():
        if cap is not None and len(members) > cap:
            continue
        for a, b in combinations(sorted(members), 2):
            h = bin(fp_of[a] ^ fp_of[b]).count("1")
            if h <= HAMMING_MAX:
                out[(a, b)] = h
    return out


def _collect_simhash(spark, cap):
    fps = spark.createDataFrame(FPS, "doc_id long, simhash32 long")
    return {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(fps, "doc_id", bucket_cap=cap).collect()
    }


def test_simhash_bucket_cap_generous_is_exact(spark):
    assert _collect_simhash(spark, 1_000) == _py_capped_pairs(None)


def test_simhash_bucket_cap_drops_hub_buckets(spark):
    # docs 1, 2, 5, 6 agree on several bands — a cap of 2 removes the
    # 3+-member hub buckets; pairs survive only via <=2-member buckets
    expected = _py_capped_pairs(2)
    got = _collect_simhash(spark, 2)
    assert got == expected
    assert set(got) < set(_py_capped_pairs(None))  # strictly fewer


# documents engineered so that:
#  - docs 10/11 share ONLY the hub trigram run "the and of the and of
#    the and of" (hub tokens appear in every doc)
#  - docs 20/21 are near-identical via rare tokens (true near-dups)
_HUB = "the and of " * 6  # hub trigrams, df = 4
_DOCS = [
    (10, _HUB + "alpha beta gamma delta epsilon zeta"),
    (11, _HUB + "eta theta iota kappa lam mu"),
    (20, _HUB + "nu xi omicron pi rho sigma tau upsilon phi chi"),
    (21, _HUB + "nu xi omicron pi rho sigma tau upsilon phi psi"),
]


def _pairs(rows):
    return {(r["doc_a"], r["doc_b"]) for r in rows}


def test_jaccard_df_cap_generous_is_exact(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    exact = _pairs(ngram_jaccard_pairs(docs, "doc_id", "text", 0.3).collect())
    capped = _pairs(
        ngram_jaccard_pairs(docs, "doc_id", "text", 0.3, df_cap=10_000).collect()
    )
    assert capped == exact
    assert (20, 21) in exact


def test_jaccard_df_cap_drops_hub_only_pairs(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    exact = _pairs(ngram_jaccard_pairs(docs, "doc_id", "text", 0.3).collect())
    # every doc carries the hub run, so hub trigrams have df 4 > 3; the
    # 20/21 pair still shares rare prefix tokens and must survive
    capped = _pairs(
        ngram_jaccard_pairs(docs, "doc_id", "text", 0.3, df_cap=3).collect()
    )
    assert (20, 21) in capped
    assert capped <= exact
    # the hub-only overlap pair (10, 11) is exactly what the cap drops
    if (10, 11) in exact:
        assert (10, 11) not in capped


def test_containment_df_cap(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    exact = _pairs(
        ngram_containment_pairs(docs, "doc_id", "text", 0.3).collect()
    )
    generous = _pairs(
        ngram_containment_pairs(docs, "doc_id", "text", 0.3, df_cap=10_000).collect()
    )
    assert generous == exact
    capped = _pairs(
        ngram_containment_pairs(docs, "doc_id", "text", 0.3, df_cap=3).collect()
    )
    assert capped <= exact
    assert (20, 21) in capped
