"""Seeded fuzz of the snapshot store's change feed — the primitive
every IVM/CDC path trusts. A random script of appends / value-class
deletes / updates / overwrites / compactions is applied while a plain
Python multiset model tracks every version's rows; then for random
version pairs the CDF must equal the hand-computed multiset diff
row-for-row (insert = new-minus-old copies, delete = old-minus-new),
NULLs and duplicate rows included, and compaction must be invisible
(same rows -> empty feed)."""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from geostore_spark.sources.store import MetadataStore

RNG = random.Random(7_2026)
SCHEMA = "k string, v long"
KS = ["a", "b", None]
VS = [None, 0, 7, 40]


@pytest.fixture()
def store(spark, tmp_path):
    return MetadataStore(spark, str(tmp_path / "store"))


def _rand_rows(rng, n):
    return [(rng.choice(KS), rng.choice(VS)) for _ in range(n)]


def _expected_cdf(old_rows, new_rows):
    old, new = Counter(old_rows), Counter(new_rows)
    feed = Counter()
    for row in set(old) | set(new):
        d = new[row] - old[row]
        if d > 0:
            feed[(row, "insert")] = d
        elif d < 0:
            feed[(row, "delete")] = -d
    return feed


def test_random_script_change_feed_is_the_multiset_diff(spark, store):
    versions = []  # python model: rows at each version, as a list

    def commit_model(rows):
        versions.append(list(rows))

    first = _rand_rows(RNG, 8)
    store.create("fz", spark.createDataFrame(first, SCHEMA))
    commit_model(first)

    for _ in range(7):
        op = RNG.choice(["append", "delete_val", "update", "overwrite", "compact"])
        cur = versions[-1]
        if op == "append":
            rows = _rand_rows(RNG, RNG.randint(1, 5))
            store.append("fz", spark.createDataFrame(rows, SCHEMA))
            commit_model(cur + rows)
        elif op == "delete_val":
            v = RNG.choice(VS)
            cond = F.col("v").isNull() if v is None else (F.col("v") == v)
            store.delete_where("fz", cond)
            # SQL DELETE WHERE removes only rows where the predicate is
            # TRUE — a NULL predicate (v IS NULL under `v = 7`) keeps
            # the row
            if v is None:
                commit_model([r for r in cur if r[1] is not None])
            else:
                commit_model([r for r in cur if r[1] != v])
        elif op == "update":
            k = RNG.choice(["a", "b"])
            nv = RNG.choice([2, 50])
            store.update_where("fz", F.col("k") == k, {"v": F.lit(nv)})
            commit_model([(rk, nv if rk == k else rv) for rk, rv in cur])
        elif op == "overwrite":
            rows = _rand_rows(RNG, RNG.randint(2, 6))
            store.overwrite("fz", spark.createDataFrame(rows, SCHEMA))
            commit_model(rows)
        else:
            store.compact("fz", target_files=1)
            commit_model(cur)  # same rows, new snapshot

    assert store.current_version("fz") == len(versions) - 1

    # every version reads back as its model multiset
    for v, rows in enumerate(versions):
        got = Counter((r["k"], r["v"]) for r in store.read("fz", v).collect())
        assert got == Counter(rows), f"snapshot v{v} diverged"

    # random version pairs: CDF == hand multiset diff
    pairs = {(0, len(versions) - 1)}
    while len(pairs) < 6:
        a, b = sorted(RNG.sample(range(len(versions)), 2))
        pairs.add((a, b))
    for a, b in sorted(pairs):
        feed = Counter(
            (((r["k"], r["v"]), r["_change_type"]))
            for r in store.changes("fz", a, b).collect()
        )
        want = _expected_cdf(versions[a], versions[b])
        assert feed == want, f"CDF v{a}->v{b}: {sorted(feed.items())} != {sorted(want.items())}"
