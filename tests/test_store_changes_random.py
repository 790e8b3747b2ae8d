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


def test_multi_commit_recorded_window_is_the_net_diff(spark, store):
    """r12: a multi-commit window whose commits ALL recorded feeds is
    served from the per-commit feed union, net-collapsed — an insert in
    one commit cancelled by a delete in a later one must vanish, exactly
    as the generic two-snapshot diff reports, and every row carries the
    window-end _commit_version like the diff does."""
    store.create("mc", spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA))
    store.append("mc", spark.createDataFrame([("c", 3), ("d", 4)], SCHEMA))
    store.delete_where("mc", F.col("k") == "c")  # retracts v1's insert
    store.append("mc", spark.createDataFrame([("e", 5)], SCHEMA))
    rows = store.changes("mc", 0, 3).collect()
    feed = Counter(((r["k"], r["v"]), r["_change_type"]) for r in rows)
    assert feed == Counter(
        {(("d", 4), "insert"): 1, (("e", 5), "insert"): 1}
    )  # (c, 3) cancelled across commits
    assert {r["_commit_version"] for r in rows} == {3}


def test_window_provenance_probes(spark, store):
    """r12 dispatch inputs: window_insert_only is True only over
    provably delete-free recorded feeds (append/compact); any 'dir'
    feed or unrecorded commit flips it. window_feeds_recorded is True
    exactly when every commit in the window recorded a feed."""
    store.create("wp", spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA))
    store.append("wp", spark.createDataFrame([("c", 3)], SCHEMA))   # v1 files
    store.compact("wp", target_files=1)                             # v2 empty
    store.delete_where("wp", F.col("k") == "a")                     # v3 dir
    store.update_where("wp", F.col("k") == "b", {"v": F.lit(9)})    # v4 none
    assert store.window_insert_only("wp", 0, 2)
    assert not store.window_insert_only("wp", 0, 3)
    assert store.window_feeds_recorded("wp", 0, 3)
    assert not store.window_feeds_recorded("wp", 0, 4)
    assert not store.window_feeds_recorded("wp", -1, 0)  # create: unrecorded
