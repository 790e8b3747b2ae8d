"""Randomized CDC apply, in the repo's seeded-generative style: a
deterministic random event log (upserts / deletes / absent-key deletes /
within-batch duplicate keys ordered by seq / NULL-valued columns) is
applied batch by batch through CdcStreamSink while a plain Python model
replays the same events by hand. After every batch the store table must
equal the model exactly and an attached min/max IVM view must equal its
own full recompute — so any error in the newest-event-per-key collapse,
the one-commit merge apply, the unmatched-delete trim, or the CDF-driven
retraction path surfaces as a divergence at some step."""

from __future__ import annotations

import random

import pytest

from geostore_spark.sources.ivm import IncrementalAggView
from geostore_spark.sources.store import MetadataStore
from geostore_spark.streaming.ivm_sink import CdcStreamSink

RNG = random.Random(20260815)
IDS = list(range(1, 13))
GRPS = ["a", "b", "c", None]
CENTS = [None, 0, 7, 40, -5, 10**9]
SCHEMA = "id int, grp string, cents long, op string, seq long"


@pytest.fixture()
def store(spark, tmp_path):
    return MetadataStore(spark, str(tmp_path / "store"))


def _gen_batch(rng, seq_start, n):
    """n random events with strictly increasing seq, then shuffled so
    DataFrame row order never encodes apply order."""
    events = []
    for i in range(n):
        if rng.random() < 0.3:
            events.append((rng.choice(IDS), None, None, "delete", seq_start + i))
        else:
            events.append(
                (
                    rng.choice(IDS),
                    rng.choice(GRPS),
                    rng.choice(CENTS),
                    "upsert",
                    seq_start + i,
                )
            )
    rng.shuffle(events)
    return events


def _model_apply(model, events):
    for id_, grp, cents, op, _ in sorted(events, key=lambda e: e[4]):
        if op == "delete":
            model.pop(id_, None)
        else:
            model[id_] = (grp, cents)


def test_random_cdc_script_matches_hand_replay(spark, store):
    view = IncrementalAggView(
        store, "cdc_r", ["grp"], ["cents"], minmax_cols=["cents"], name="vcr"
    )
    sink = CdcStreamSink(store, "cdc_r", pk=["id"], view=view, seq_col="seq")
    model: dict[int, tuple] = {}
    seq = 0

    for batch_id in range(6):
        n = RNG.randint(4, 10)
        events = _gen_batch(RNG, seq, n)
        seq += n
        sink(spark.createDataFrame(events, SCHEMA), batch_id=batch_id)
        _model_apply(model, events)

        got = {
            r["id"]: (r["grp"], r["cents"])
            for r in store.read("cdc_r").collect()
        }
        assert got == model, (
            f"table diverged after batch {batch_id}: "
            f"got={sorted(got.items())} model={sorted(model.items())}"
        )
        cols = ["grp", "n_rows", "sum_cents", "min_cents", "max_cents"]
        key = lambda t: tuple((x is None, str(x)) for x in t)  # noqa: E731
        v = sorted(
            (tuple(r) for r in view.read().select(*cols).collect()), key=key
        )
        w = sorted(
            (tuple(r) for r in view.recompute().select(*cols).collect()), key=key
        )
        assert v == w, f"view diverged after batch {batch_id}: {v} != {w}"


def test_random_cdc_script_survives_interleaved_maintenance(spark, store):
    """The whole storage stack under ONE random script: CDC batches
    interleaved with compaction (same rows, new snapshot — must be an
    empty change feed to the view) and vacuum (sometimes aggressive
    enough to remove the view's applied anchor, forcing the rebuild
    path at a random point). Table must track the hand-applied model
    and the view its recompute after every step, whatever interleaving
    the seed produces."""
    rng = random.Random(31_337)
    view = IncrementalAggView(
        store, "cdc_m", ["grp"], ["cents"], minmax_cols=["cents"], name="vcm"
    )
    sink = CdcStreamSink(store, "cdc_m", pk=["id"], view=view, seq_col="seq")
    model: dict[int, tuple] = {}
    seq = 0
    modes_seen = set()

    for batch_id in range(7):
        events = _gen_batch(rng, seq, rng.randint(3, 8))
        seq += len(events)
        sink(spark.createDataFrame(events, SCHEMA), batch_id=batch_id)
        _model_apply(model, events)

        op = rng.choice(["none", "compact", "vacuum_keep", "vacuum_aggressive"])
        if op == "compact" and store.current_version("cdc_m") >= 0:
            store.compact("cdc_m", target_files=1)
        elif op == "vacuum_keep" and store.current_version("cdc_m") >= 0:
            store.vacuum("cdc_m", keep_last=3)
        elif op == "vacuum_aggressive" and store.current_version("cdc_m") >= 0:
            # compact first so the head advances past the view's applied
            # anchor, then vacuum it away — the retention race that must
            # force the rebuild path (the sink refreshes every batch, so
            # without the compact the anchor IS the head and survives)
            store.compact("cdc_m", target_files=1)
            store.vacuum("cdc_m", keep_last=1)
        modes_seen.add(view.refresh()["mode"])

        got = {
            r["id"]: (r["grp"], r["cents"])
            for r in store.read("cdc_m").collect()
        }
        assert got == model, f"table diverged after step {batch_id} ({op})"
        cols = ["grp", "n_rows", "sum_cents", "min_cents", "max_cents"]
        key = lambda t: tuple((x is None, str(x)) for x in t)  # noqa: E731
        v = sorted(
            (tuple(r) for r in view.read().select(*cols).collect()), key=key
        )
        w = sorted(
            (tuple(r) for r in view.recompute().select(*cols).collect()), key=key
        )
        assert v == w, f"view diverged after step {batch_id} ({op})"

    # the seed must actually exercise the interesting refresh modes
    assert "incremental" in modes_seen or "noop" in modes_seen
    assert "rebuild" in modes_seen, modes_seen


class SimulatedKill(Exception):
    """Stands in for a process kill at a commit boundary."""


def test_crash_point_fuzz_heals_on_replay(spark, tmp_path):
    """r7 verdict item 3: inject a kill at EVERY commit boundary of the
    merge/append -> rename -> pointer-swap -> view-refresh chain (the
    _crash_hook seam fires after the staged parquet write, after the
    commit-meta write, after the atomic rename, around the pointer
    swap — across BOTH the source commit and the view's own commits),
    then replay the batch exactly as foreachBatch does after a failure.
    The table must equal the hand-applied model (no lost batch, no
    double apply — the IvmStreamSink scripts would double-APPEND), the
    view must equal its recompute, and leftover ``_staged.*`` scratch
    must never wedge a later commit. Mirrors the reference's
    retry-on-timeout protocol
    (/root/reference/geostore/import_dataset_file.py:46-99).

    Seeds/boundaries covered scale with CDC_CRASH_FUZZ_SCRIPTS (the
    50-script sign-off pass runs out-of-suite; default sized for CI)."""
    import os as _os

    from geostore_spark.streaming.ivm_sink import IvmStreamSink

    n_scripts = int(_os.environ.get("CDC_CRASH_FUZZ_SCRIPTS", "10"))
    # keep the descriptor itself: re-assigning the bare function would
    # turn the no-op hook into a bound method taking (self, label)
    orig_hook = MetadataStore.__dict__["_crash_hook"]
    kill_labels = set()

    for script in range(n_scripts):
        rng = random.Random(880_000 + script)
        root = str(tmp_path / f"s{script}")
        use_cdc = script % 2 == 0

        def mk():
            store = MetadataStore(spark, root)
            view = IncrementalAggView(
                store, "t", ["grp"], ["cents"], minmax_cols=["cents"], name="v"
            )
            if use_cdc:
                sink = CdcStreamSink(store, "t", pk=["id"], view=view, seq_col="seq")
            else:
                sink = IvmStreamSink(store, "t", view)
            return store, view, sink

        store, view, sink = mk()
        cdc_model: dict[int, tuple] = {}
        append_model: list[tuple] = []
        seq = 0

        for batch_id in range(3):
            if use_cdc:
                events = _gen_batch(rng, seq, rng.randint(3, 6))
                seq += len(events)
                bdf = spark.createDataFrame(events, SCHEMA)
            else:
                rows = [
                    (rng.choice(GRPS), rng.choice(CENTS))
                    for _ in range(rng.randint(2, 5))
                ]
                bdf = spark.createDataFrame(rows, "grp string, cents long")

            # arm: kill at the crash_at-th boundary crossing of this batch
            crash_at = rng.randint(1, 10)
            state = {"n": 0}

            def hook(label, _state=state, _at=crash_at):
                _state["n"] += 1
                if _state["n"] == _at:
                    raise SimulatedKill(label)

            MetadataStore._crash_hook = staticmethod(hook)
            try:
                sink(bdf, batch_id=batch_id)
            except SimulatedKill as kill:
                kill_labels.add(str(kill))
                MetadataStore._crash_hook = orig_hook
                # process restart: fresh objects over the same dirs,
                # then foreachBatch redelivers the failed batch id
                store, view, sink = mk()
                sink(bdf, batch_id=batch_id)
            finally:
                MetadataStore._crash_hook = orig_hook

            if use_cdc:
                _model_apply(cdc_model, events)
                got = {
                    r["id"]: (r["grp"], r["cents"])
                    for r in store.read("t").collect()
                }
                assert got == cdc_model, (
                    f"script {script} batch {batch_id}: table diverged"
                )
            else:
                append_model.extend(rows)
                got_rows = sorted(
                    ((r["grp"], r["cents"]) for r in store.read("t").collect()),
                    key=lambda t: (str(t[0]), str(t[1])),
                )
                want = sorted(
                    append_model, key=lambda t: (str(t[0]), str(t[1]))
                )
                assert got_rows == want, (
                    f"script {script} batch {batch_id}: lost or double-"
                    f"applied append — {got_rows} != {want}"
                )
            cols = ["grp", "n_rows", "sum_cents", "min_cents", "max_cents"]
            key = lambda t: tuple((x is None, str(x)) for x in t)  # noqa: E731
            v = sorted(
                (tuple(r) for r in view.read().select(*cols).collect()), key=key
            )
            w = sorted(
                (tuple(r) for r in view.recompute().select(*cols).collect()),
                key=key,
            )
            assert v == w, f"script {script} batch {batch_id}: view diverged"

        # crashed stagings are inert and vacuum reclaims them
        store.vacuum("t", keep_last=1)
        store.vacuum("v", keep_last=1)
        for table in ("t", "v"):
            leftovers = [
                n
                for n in _os.listdir(_os.path.join(root, table))
                if n.startswith("_staged.")
            ]
            assert not leftovers, f"script {script}: scratch survived vacuum"

    # the fuzz must actually strike commit boundaries, not just run clean
    assert len(kill_labels) >= 3, kill_labels
