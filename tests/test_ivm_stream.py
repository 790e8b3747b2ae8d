"""Streaming materialized view: the foreachBatch IVM sink must keep the
view equal to a full recompute after every microbatch drain, refresh
incrementally (not full-build) after the first batch, and skip replayed
batch ids idempotently across restarts."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from geostore_spark.sources.ivm import IncrementalAggView
from geostore_spark.sources.store import MetadataStore
from geostore_spark.streaming.ivm_sink import CdcStreamSink, IvmStreamSink


@pytest.fixture()
def store(spark, tmp_path):
    return MetadataStore(spark, str(tmp_path / "store"))


def _write_batch(d: str, name: str, rows: list[dict]) -> None:
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _drain(spark, src_dir: str, ckpt: str, sink, schema: str = "k string, cents long") -> None:
    q = (
        spark.readStream.schema(schema)
        .json(src_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_sink_maintains_view_incrementally(spark, store, tmp_path):
    src_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    view = IncrementalAggView(store, "facts", ["k"], ["cents"], name="v")
    sink = IvmStreamSink(store, "facts", view)

    _write_batch(src_dir, "b1.json", [
        {"k": "a", "cents": 100}, {"k": "b", "cents": 40},
    ])
    _drain(spark, src_dir, ckpt, sink)
    assert sorted(tuple(r) for r in view.read().collect()) == sorted(
        tuple(r) for r in view.recompute().collect()
    )
    v_after_b1 = store.current_version("v")

    _write_batch(src_dir, "b2.json", [
        {"k": "a", "cents": 250}, {"k": "c", "cents": 7},
    ])
    _drain(spark, src_dir, ckpt, sink)
    got = {r["k"]: (r["n_rows"], r["sum_cents"]) for r in view.read().collect()}
    assert got == {"a": (2, 350), "b": (1, 40), "c": (1, 7)}
    # the second batch refreshed incrementally: the view advanced by
    # exactly one snapshot, not a rebuild from scratch
    assert store.current_version("v") == v_after_b1 + 1

    # replay safety: re-invoking the sink with an already-applied batch
    # id (what foreachBatch does after a failure) must be a no-op
    replay = spark.createDataFrame([("a", 999)], "k string, cents long")
    sink(replay, batch_id=0)
    got2 = {r["k"]: (r["n_rows"], r["sum_cents"]) for r in view.read().collect()}
    assert got2 == got
    assert store.current_version("facts") == 1  # v0=b1, v1=b2 — nothing else

    # a NEW batch id still applies
    sink(replay, batch_id=99)
    got3 = {r["k"]: (r["n_rows"], r["sum_cents"]) for r in view.read().collect()}
    assert got3["a"] == (3, 1349)


def test_stream_sink_torn_run_cannot_double_apply(spark, store):
    """The r5 advisor finding: a crash after the source append but
    before progress was recorded must NOT re-append the batch on
    replay. The batch id now rides the append commit itself
    (transaction metadata), so the torn state is indistinguishable
    from a completed append — replay skips it and only catches the
    view up."""
    view = IncrementalAggView(store, "facts2", ["k"], ["cents"], name="v2")
    sink = IvmStreamSink(store, "facts2", view)

    b0 = spark.createDataFrame([("a", 10), ("b", 20)], "k string, cents long")
    sink(b0, batch_id=0)

    # simulate the torn run: batch 1's append COMMITTED (with its batch
    # id in the commit meta) but the process died before view.refresh()
    b1 = spark.createDataFrame([("a", 5)], "k string, cents long")
    store.append("facts2", b1, meta={"stream_batch_id": 1})
    assert store.current_version("facts2") == 1
    stale = {r["k"]: r["n_rows"] for r in view.read().collect()}
    assert stale["a"] == 1  # view not yet caught up — genuinely torn

    # foreachBatch replays batch 1 after the restart
    sink(b1, batch_id=1)
    # source was NOT double-appended...
    assert store.current_version("facts2") == 1
    rows = store.read("facts2").collect()
    assert len(rows) == 3
    # ...and the view healed to the exact recompute
    got = sorted(tuple(r) for r in view.read().collect())
    assert got == sorted(tuple(r) for r in view.recompute().collect())
    assert {r["k"]: (r["n_rows"], r["sum_cents"]) for r in view.read().collect()}[
        "a"
    ] == (2, 15)


def test_streaming_active_intervals_composition(spark, store):
    """Late-data-safe streaming sweep line from existing layers: the
    producer emits commutative endpoint DELTAS (+1 at start, -1 after
    end), the IVM sink folds them into a per-day delta view, and the
    active-interval profile is a read-time prefix sum over the
    day-bounded view — running totals never live in stream state, so
    out-of-order intervals cannot corrupt them (the batch twin is
    x_orders_active_intervals)."""
    from pyspark.sql import functions as F

    from geostore_spark.operators.util import distributed_prefix_sum

    view = IncrementalAggView(store, "iv_deltas", ["day"], ["dn"], name="vi")
    sink = IvmStreamSink(store, "iv_deltas", view)

    def deltas(intervals):  # [(start_day, end_day)] -> endpoint delta rows
        rows = []
        for s, e in intervals:
            rows.append((s, 1))
            rows.append((e + 1, -1))
        return spark.createDataFrame(rows, "day int, dn int")

    # batch 0, then an OUT-OF-ORDER batch 1 covering earlier days
    sink(deltas([(5, 9), (7, 12)]), batch_id=0)
    sink(deltas([(1, 6)]), batch_id=1)

    cum = distributed_prefix_sum(
        view.read().select("day", "sum_dn"), [], ["day"], "sum_dn",
        out_name="n_active",
    )
    got = {
        r["day"]: r["n_active"]
        for r in cum.filter(F.col("n_active") > 0).collect()
    }
    # sweep-line output is the step function's BREAKPOINTS (endpoint
    # days); each count holds until the next breakpoint. Intervals
    # [5,9], [7,12], [1,6] -> endpoints {1,5,7,10,13}, hand-checked:
    assert got == {1: 1, 5: 2, 7: 2, 10: 1}  # day 13 drops to 0


def test_stream_sink_maintains_minmax_view(spark, store, tmp_path):
    """The round-7 IVM extension works under the streaming sink too: a
    view with MIN/MAX columns stays equal to a full recompute across
    microbatches, including a batch whose rows only contain NULLs in
    the aggregated column (streams deliver inserts, so the min/max path
    is the incremental LEAST/GREATEST fold — retraction recompute is
    exercised by the batch test_ivm_minmax_recompute_on_retract)."""
    src_dir = str(tmp_path / "in_mm")
    ckpt = str(tmp_path / "ckpt_mm")
    view = IncrementalAggView(
        store, "mm_stream", ["k"], ["cents"], minmax_cols=["cents"], name="vmms"
    )
    sink = IvmStreamSink(store, "mm_stream", view)

    _write_batch(src_dir, "b0.json", [
        {"k": "a", "cents": 5}, {"k": "a", "cents": 9}, {"k": "b", "cents": 40},
    ])
    _drain(spark, src_dir, ckpt, sink)

    def rows():
        return sorted(
            tuple(r)
            for r in view.read()
            .select("k", "n_rows", "sum_cents", "min_cents", "max_cents")
            .collect()
        )

    assert rows() == sorted(
        tuple(r)
        for r in view.recompute()
        .select("k", "n_rows", "sum_cents", "min_cents", "max_cents")
        .collect()
    )

    _write_batch(src_dir, "b1.json", [
        {"k": "a", "cents": 3}, {"k": "b", "cents": None}, {"k": "c", "cents": None},
    ])
    _drain(spark, src_dir, ckpt, sink)
    got = rows()
    assert got == sorted(
        tuple(r)
        for r in view.recompute()
        .select("k", "n_rows", "sum_cents", "min_cents", "max_cents")
        .collect()
    )
    assert ("a", 3, 17, 3, 9) in got   # min folded incrementally
    assert ("b", 2, 40, 40, 40) in got # NULL insert left extremes intact
    assert ("c", 1, None, None, None) in got


CDC_SCHEMA = "id int, grp string, cents long, op string"


def _view_rows(view):
    cols = ["grp", "n_rows", "sum_cents", "min_cents", "max_cents"]
    return sorted(tuple(r) for r in view.read().select(*cols).collect())


def _recomputed_rows(view):
    cols = ["grp", "n_rows", "sum_cents", "min_cents", "max_cents"]
    return sorted(tuple(r) for r in view.recompute().select(*cols).collect())


def test_cdc_sink_applies_upserts_and_deletes(spark, store):
    """A change stream (upsert/delete events keyed by id) applied as one
    merge commit per microbatch keeps both the table and a maintained
    MIN/MAX view exactly equal to replaying the events by hand — the
    streamed delete retracts the group's minimum, so the view's
    recompute-on-retract path fires from a STREAM."""
    view = IncrementalAggView(
        store, "cdc_t", ["grp"], ["cents"], minmax_cols=["cents"], name="vcdc"
    )
    sink = CdcStreamSink(store, "cdc_t", pk=["id"], view=view)

    b0 = spark.createDataFrame(
        [
            (1, "a", 100, "upsert"),
            (2, "a", 500, "upsert"),
            (3, "b", 40, "upsert"),
        ],
        CDC_SCHEMA,
    )
    sink(b0, batch_id=0)
    assert _view_rows(view) == _recomputed_rows(view)
    assert ("a", 2, 600, 100, 500) in _view_rows(view)
    v_table = store.current_version("cdc_t")

    # delete id=1 (group a's MIN — a LEAST/GREATEST fold would keep the
    # stale 100), update id=2 down to 50, and replay a delete for a key
    # that never existed (the reference's second-DELETE-is-a-404 case)
    b1 = spark.createDataFrame(
        [
            (1, None, None, "delete"),
            (2, "a", 50, "upsert"),
            (9, None, None, "delete"),
        ],
        CDC_SCHEMA,
    )
    sink(b1, batch_id=1)
    # exactly ONE commit applied the whole batch
    assert store.current_version("cdc_t") == v_table + 1
    rows = {r["id"]: (r["grp"], r["cents"]) for r in store.read("cdc_t").collect()}
    assert rows == {2: ("a", 50), 3: ("b", 40)}
    got = _view_rows(view)
    assert got == _recomputed_rows(view)
    assert ("a", 1, 50, 50, 50) in got
    assert ("b", 1, 40, 40, 40) in got

    # replayed batch id: table untouched, view refresh is a noop
    sink(b1, batch_id=1)
    assert store.current_version("cdc_t") == v_table + 1
    assert _view_rows(view) == got


def test_cdc_sink_last_event_per_key_wins_by_seq(spark, store):
    """A batch carrying several events for one key applies only the
    latest by seq_col — insert-then-delete nets to absent, stale
    updates lose to newer ones regardless of row order."""
    sink = CdcStreamSink(store, "cdc_seq", pk=["id"], seq_col="seq")
    b0 = spark.createDataFrame(
        [
            (1, "a", 10, "upsert", 100),
            (1, None, None, "delete", 101),  # newest for id=1
            (2, "a", 99, "upsert", 201),     # newest for id=2, listed first
            (2, "a", 11, "upsert", 200),
        ],
        CDC_SCHEMA + ", seq long",
    )
    sink(b0, batch_id=0)
    rows = {r["id"]: r["cents"] for r in store.read("cdc_seq").collect()}
    assert rows == {2: 99}

    # and across batches the merge path resolves the same way
    b1 = spark.createDataFrame(
        [(2, "a", 1, "upsert", 300), (2, None, None, "delete", 301)],
        CDC_SCHEMA + ", seq long",
    )
    sink(b1, batch_id=1)
    assert store.read("cdc_seq").count() == 0


def test_cdc_sink_through_real_stream_drain(spark, store, tmp_path):
    """The sink under an actual readStream->foreachBatch drain (not a
    direct call): files landing between availableNow triggers become
    separate batch ids, a restart re-delivers nothing, and the table
    equals the hand-applied event log."""
    src_dir = str(tmp_path / "cdc_in")
    ckpt = str(tmp_path / "cdc_ckpt")
    sink = CdcStreamSink(store, "cdc_rt", pk=["id"], seq_col="seq")

    def drain():
        _drain(spark, src_dir, ckpt, sink, schema=CDC_SCHEMA + ", seq long")

    _write_batch(src_dir, "e0.json", [
        {"id": 1, "grp": "a", "cents": 10, "op": "upsert", "seq": 1},
        {"id": 2, "grp": "b", "cents": 20, "op": "upsert", "seq": 2},
    ])
    drain()
    _write_batch(src_dir, "e1.json", [
        {"id": 1, "grp": None, "cents": None, "op": "delete", "seq": 3},
        {"id": 3, "grp": "b", "cents": 5, "op": "upsert", "seq": 4},
    ])
    drain()
    rows = {r["id"]: (r["grp"], r["cents"]) for r in store.read("cdc_rt").collect()}
    assert rows == {2: ("b", 20), 3: ("b", 5)}
    v = store.current_version("cdc_rt")
    drain()  # nothing new: no batch delivered, no commit
    assert store.current_version("cdc_rt") == v


def test_cdc_delete_matches_null_key(spark, store):
    """If an upsert created a NULL-keyed row (the merge matches keys
    null-safely), a later delete for that key must find it — the
    absent-key trim probe has to be null-safe like the merge itself."""
    sink = CdcStreamSink(store, "cdc_nk", pk=["id"])
    sink(
        spark.createDataFrame(
            [(None, "a", 5, "upsert"), (1, "a", 7, "upsert")], CDC_SCHEMA
        ),
        batch_id=0,
    )
    assert store.read("cdc_nk").count() == 2
    sink(
        spark.createDataFrame([(None, None, None, "delete")], CDC_SCHEMA),
        batch_id=1,
    )
    rows = {r["id"]: r["cents"] for r in store.read("cdc_nk").collect()}
    assert rows == {1: 7}


def test_cdc_sink_rejects_unordered_duplicate_keys(spark, store):
    """Without a seq_col there is no defined apply order for a
    multi-event key — the sink must refuse rather than pick one."""
    sink = CdcStreamSink(store, "cdc_dup", pk=["id"])
    bad = spark.createDataFrame(
        [(1, "a", 10, "upsert"), (1, "a", 20, "upsert")], CDC_SCHEMA
    )
    with pytest.raises(ValueError, match="multiple events"):
        sink(bad, batch_id=0)


def test_maintenance_commit_does_not_reset_batch_watermark(spark, store):
    """r7 advisor: a metadata-less commit (compact) between a batch and
    a crash replay reset the batch-id watermark to -1, double-appending
    the replayed batch in IvmStreamSink. Two defenses are pinned here:
    compact() carries the prior commit's txn meta forward, and the sink
    scans retained history rather than only the latest commit."""
    view = IncrementalAggView(store, "facts_m", ["k"], ["cents"], name="v_m")
    sink = IvmStreamSink(store, "facts_m", view)

    b0 = spark.createDataFrame([("a", 100), ("b", 40)], "k string, cents long")
    sink(b0, batch_id=0)
    assert sink._last_applied() == 0

    # maintenance between the batch and its replay
    store.compact("facts_m", target_files=1)
    assert sink._last_applied() == 0, "compact must not reset the watermark"

    # crash replay of batch 0 must be a no-op
    rows_before = store.read("facts_m").count()
    sink(b0, batch_id=0)
    assert store.read("facts_m").count() == rows_before
    got = {r["k"]: r["sum_cents"] for r in view.read().collect()}
    assert got == {"a": 100, "b": 40}

    # even with the carried meta vacuumed away alongside older commits,
    # the history scan still finds the max batch id on retained commits
    sink(spark.createDataFrame([("c", 7)], "k string, cents long"), batch_id=1)
    store.compact("facts_m", target_files=1)
    store.vacuum("facts_m", keep_last=1)  # only the compact commit survives
    assert sink._last_applied() == 1, "carried-forward meta survives vacuum"


def test_build_session_persistent_catalog_conflict_raises(spark):
    """r7 advisor: static confs (catalogImplementation, warehouse dir,
    Derby URL) are silently ignored by getOrCreate() when a session is
    already live — asking for a durable catalog must fail loudly then,
    not hand back an in-memory one."""
    from geostore_spark.session import build_session

    with pytest.raises(RuntimeError, match="persistent_catalog_dir"):
        build_session(persistent_catalog_dir="/tmp/nonexistent_cat_dir")


def test_cdc_apply_has_no_target_scan_beyond_the_merge(spark, store, monkeypatch):
    """r7 verdict item 2: the delete-trim used to pre-probe the target
    keys with a THIRD scan of the target on every batch. The insert arm
    is now gated on the op tag inside the merge plan itself, so an
    apply's plan must contain exactly the merge's own two target scans
    (matched-key probe + insert anti-join) — for delete-free AND
    delete-bearing batches — and absent-key deletes stay no-ops."""
    sink = CdcStreamSink(store, "t_scan", pk=["k"], seq_col="seq")
    sink(
        spark.createDataFrame(
            [("a", 1, "upsert", 0), ("b", 2, "upsert", 0)],
            "k string, v long, op string, seq long",
        ),
        batch_id=0,
    )

    captured = {}
    orig = store._write_snapshot

    def spy(table, df, base, meta=None, **kw):
        captured["df"] = df
        return orig(table, df, base, meta=meta, **kw)

    monkeypatch.setattr(store, "_write_snapshot", spy)

    def n_target_scans() -> int:
        # the batch source is a LogicalRDD (createDataFrame), so every
        # FileScan in the physical plan is a read of the target table
        plan = captured["df"]._jdf.queryExecution().sparkPlan().toString()
        return plan.count("FileScan")

    sink(
        spark.createDataFrame(
            [("a", 10, "upsert", 0), ("c", 3, "upsert", 0)],
            "k string, v long, op string, seq long",
        ),
        batch_id=1,
    )
    assert n_target_scans() == 2, "delete-free batch: merge scans only"

    sink(
        spark.createDataFrame(
            [("b", None, "delete", 0), ("zz", None, "delete", 0)],
            "k string, v long, op string, seq long",
        ),
        batch_id=2,
    )
    assert n_target_scans() == 2, "delete batch: merge scans only"
    got = {r["k"]: r["v"] for r in store.read("t_scan").collect()}
    # absent-key delete 'zz' is a no-op; 'b' deleted; 'a' updated; 'c' inserted
    assert got == {"a": 10, "c": 3}
