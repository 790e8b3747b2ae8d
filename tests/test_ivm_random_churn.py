"""Randomized IVM churn, in the repo's seeded-generative style: a
deterministic random script of mixed inserts / value-targeted deletes /
key drains / updates — with NULLs salted into both sum and min/max
columns — applied step by step, asserting view == recompute after
EVERY refresh. This is the strongest pin on the round-7 algebra: any
error in the signed fold, the non-null bookkeeping, the
LEAST/GREATEST insert path, or the recompute-on-retract patch
accumulates and surfaces as a divergence at some step."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from geostore_spark.sources.ivm import IncrementalAggView
from geostore_spark.sources.store import MetadataStore

KEYS = ["a", "b", "c", "d", None]  # NULL is a legitimate group key
RNG = random.Random(20260815)


def _key_eq(col, k):
    return col.isNull() if k is None else (col == k)


@pytest.fixture()
def store(spark, tmp_path):
    return MetadataStore(spark, str(tmp_path / "store"))


def _rand_rows(rng, n):
    return [
        (
            rng.choice(KEYS),
            rng.choice([None, 0, 1, 7, 40, -5, 10**9]),
            rng.choice([None, 3, 11, 29]),
        )
        for _ in range(n)
    ]


def _views_equal(view):
    cols = ["k", "n_rows", "sum_v", "min_m", "max_m"]
    key = lambda t: tuple((x is None, str(x)) for x in t)  # noqa: E731
    got = sorted((tuple(r) for r in view.read().select(*cols).collect()), key=key)
    want = sorted(
        (tuple(r) for r in view.recompute().select(*cols).collect()), key=key
    )
    return got, want


def test_random_churn_view_matches_recompute(spark, store):
    schema = "k string, v long, m long"
    store.create("rc", spark.createDataFrame(_rand_rows(RNG, 12), schema))
    view = IncrementalAggView(
        store, "rc", ["k"], ["v"], minmax_cols=["m"], name="vrc"
    )
    assert view.refresh()["mode"] == "full"
    got, want = _views_equal(view)
    assert got == want

    for step in range(8):
        op = RNG.choice(["insert", "delete_val", "drain_key", "update", "mixed"])
        if op == "insert":
            store.append("rc", spark.createDataFrame(_rand_rows(RNG, RNG.randint(1, 6)), schema))
        elif op == "delete_val":
            # retract one value class for one key — min/max may rewind
            k = RNG.choice(KEYS)
            v = RNG.choice([None, 0, 7, 40])
            cond = _key_eq(F.col("k"), k) & (
                F.col("v").isNull() if v is None else (F.col("v") == v)
            )
            store.delete_where("rc", cond)
        elif op == "drain_key":
            store.delete_where("rc", _key_eq(F.col("k"), RNG.choice(KEYS)))
        elif op == "update":
            k = RNG.choice(KEYS)
            store.update_where(
                "rc", _key_eq(F.col("k"), k),
                {"m": F.lit(RNG.choice([None, 2, 50])), "v": F.col("v") * 2},
            )
        else:  # mixed: delete + insert in separate commits, one refresh
            store.delete_where("rc", F.col("m").isNull() & _key_eq(F.col("k"), RNG.choice(KEYS)))
            store.append("rc", spark.createDataFrame(_rand_rows(RNG, 3), schema))
        s = view.refresh()
        # update_where records no change feed -> the r12 cost dispatch
        # rebuilds (one scan) instead of paying the two-snapshot generic
        # diff; every other op records its feed and folds incrementally
        # (the 'mixed' two-commit window rides the r12 multi-commit
        # recorded-feed union in changes())
        want_modes = {"rebuild"} if op == "update" else {"incremental", "noop"}
        assert s["mode"] in want_modes, (op, s)
        got, want = _views_equal(view)
        assert got == want, f"divergence after step {step} ({op}): {got} != {want}"
