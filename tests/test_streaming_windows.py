"""Streaming window + custom-stateful-operator tests: watermark late-data
drop across checkpointed drains, and applyInPandasWithState accumulation."""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

from geostore_spark.streaming.windows import (
    drain_collect,
    event_stream,
    running_user_totals,
    streaming_tumbling_counts,
)


def _ts(day: int, hour: int = 0) -> str:
    return datetime(2026, 3, day, hour, tzinfo=timezone.utc).isoformat()


def _write_events(path: str, name: str, rows: list[dict]) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _event(event_id: int, user_id: int, ts: str, value: float = 1.0) -> dict:
    return {
        "event_id": event_id,
        "user_id": user_id,
        "event_type": "click",
        "value": value,
        "ts": ts,
    }


def test_streaming_tumbling_watermark_drops_late_events(spark, tmp_path):
    events = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: two days of events; day-1 window closes once watermark
    # (max ts - 1h) passes its end.
    _write_events(
        events,
        "b1.json",
        [
            _event(1, 1, _ts(1, 5)),
            _event(2, 1, _ts(1, 6)),
            _event(3, 2, _ts(3, 12)),  # advances watermark past day 1+2
        ],
    )
    first = drain_collect(
        streaming_tumbling_counts(event_stream(spark, events)), ckpt
    )
    assert {(r["w_start"].day, r["n"]) for r in first} >= {(1, 2)}

    # batch 2: an event for day 1 arrives after the watermark moved to
    # day 3 11:00 → dropped; a fresh day-4 event advances the stream.
    _write_events(
        events,
        "b2.json",
        [_event(4, 1, _ts(1, 7)), _event(5, 2, _ts(4, 12))],
    )
    second = drain_collect(
        streaming_tumbling_counts(event_stream(spark, events)), ckpt
    )
    # the late day-1 event never re-emits or corrects the closed window
    assert all(r["w_start"].day != 1 for r in second)


def test_apply_in_pandas_with_state_accumulates_across_batches(spark, tmp_path):
    events = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")

    _write_events(
        events,
        "b1.json",
        [
            _event(1, 7, _ts(1, 1), 2.0),
            _event(2, 7, _ts(1, 2), 3.0),
            _event(3, 8, _ts(1, 3), 5.0),
        ],
    )
    t1_rows = drain_collect(
        running_user_totals(event_stream(spark, events)), ckpt, "update"
    )
    t1 = {r["user_id"]: (r["n_events"], r["sum_value"]) for r in t1_rows}
    assert t1[7] == (2, 5.0)
    assert t1[8] == (1, 5.0)

    # second micro-batch folds into checkpointed state across a restart
    _write_events(events, "b2.json", [_event(4, 7, _ts(2, 1), 10.0)])
    t2_rows = drain_collect(
        running_user_totals(event_stream(spark, events)), ckpt, "update"
    )
    t2 = {r["user_id"]: (r["n_events"], r["sum_value"]) for r in t2_rows}
    assert t2[7] == (3, 15.0)  # state (2, 5.0) carried across the restart
    last = [r["last_ts"] for r in t2_rows if r["user_id"] == 7][0]
    assert last.day == 2


def test_streaming_decontaminate_flags_benchmark_overlap(spark, tmp_path):
    import json as _json

    from geostore_spark.streaming.windows import (
        doc_stream,
        streaming_decontaminate,
    )

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    bench = spark.createDataFrame(
        [(100, "w1 w2 w3 w4 tail")], "doc_id long, text string"
    )

    def doc(doc_id, text):
        return {"doc_id": doc_id, "text": text, "ts": _ts(1, doc_id % 12)}

    # batch 1: doc 1 shares the 4-gram 'w1 w2 w3 w4'; doc 2 is clean
    (docs_dir / "b1.json").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [doc(1, "x w1 w2 w3 w4 y"), doc(2, "a b c d e")]
        )
    )
    stream = streaming_decontaminate(
        doc_stream(spark, str(docs_dir)), bench, n=4
    )
    first = drain_collect(stream, ckpt)
    assert {(r["doc_id"], r["bench_id"]) for r in first} == {(1, 100)}

    # batch 2: another contaminated doc arrives; doc 1 does not re-emit
    (docs_dir / "b2.json").write_text(_json.dumps(doc(3, "w1 w2 w3 w4")))
    second = drain_collect(
        streaming_decontaminate(doc_stream(spark, str(docs_dir)), bench, n=4),
        ckpt,
    )
    assert {(r["doc_id"], r["bench_id"]) for r in second} == {(3, 100)}


def test_streaming_session_window_merges_and_closes(spark, tmp_path):
    from geostore_spark.streaming.windows import streaming_session_counts

    events = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")

    # u7: three events 10 min apart (one session), then 2 days of silence
    # via u8's late event that advances the watermark past the session end
    _write_events(
        events,
        "b1.json",
        [
            _event(1, 7, _ts(1, 1)),
            {**_event(2, 7, _ts(1, 1)),
             "ts": datetime(2026, 3, 1, 1, 10, tzinfo=timezone.utc).isoformat()},
            {**_event(3, 7, _ts(1, 1)),
             "ts": datetime(2026, 3, 1, 1, 20, tzinfo=timezone.utc).isoformat()},
            _event(4, 8, _ts(3, 12)),
        ],
    )
    rows = drain_collect(
        streaming_session_counts(event_stream(spark, events)), ckpt
    )
    by_user = {r["user_id"]: r for r in rows}
    # u7's merged session: 3 events, [01:00, 01:50) (last event + 30 min gap)
    assert by_user[7]["n_events"] == 3
    assert by_user[7]["s_start"].hour == 1 and by_user[7]["s_start"].minute == 0
    assert by_user[7]["s_end"].minute == 50
    # u8's session stays open (watermark has not passed its end) → not emitted
    assert 8 not in by_user


def test_streaming_funnel_emits_conversion_exactly_once(spark, tmp_path):
    from geostore_spark.streaming.windows import streaming_funnel

    events = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")

    def typed(event_id, user_id, ts, etype):
        return {**_event(event_id, user_id, ts), "event_type": etype}

    # batch 1: u1 signs up; u2 purchases with no signup (never converts)
    _write_events(
        events,
        "b1.json",
        [typed(1, 1, _ts(1, 0), "signup"), typed(2, 2, _ts(1, 1), "purchase")],
    )
    first = drain_collect(streaming_funnel(event_stream(spark, events)), ckpt)
    assert first == []

    # batch 2: u1's first qualifying purchase (2 days later) + a second
    # purchase that must NOT re-emit; u2 still unconverted
    _write_events(
        events,
        "b2.json",
        [typed(3, 1, _ts(3, 0), "purchase"), typed(4, 1, _ts(4, 0), "purchase")],
    )
    second = drain_collect(streaming_funnel(event_stream(spark, events)), ckpt)
    assert [(r["user_id"], r["days_to_convert"]) for r in second] == [(1, 2)]

    # batch 3: nothing new for u1 → no duplicate emission across restart
    _write_events(events, "b3.json", [typed(5, 2, _ts(5, 0), "purchase")])
    third = drain_collect(streaming_funnel(event_stream(spark, events)), ckpt)
    assert third == []  # u1 already converted, u2 never signed up


def test_streaming_attribution_tracks_last_touch(spark, tmp_path):
    from geostore_spark.streaming.windows import streaming_attribution

    events = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")

    def typed(event_id, user_id, ts, etype):
        return {**_event(event_id, user_id, ts), "event_type": etype}

    # batch 1: u1 clicks then purchases 30 min later (within_1h);
    # u2 purchases with no touch
    _write_events(
        events,
        "b1.json",
        [
            typed(1, 1, _ts(1, 10), "click"),
            {**typed(2, 1, _ts(1, 10), "purchase"),
             "ts": datetime(2026, 3, 1, 10, 30, tzinfo=timezone.utc).isoformat()},
            typed(3, 2, _ts(1, 9), "purchase"),
        ],
    )
    first = drain_collect(streaming_attribution(event_stream(spark, events)), ckpt)
    got = {r["event_id"]: (r["touch_bucket"], r["latency_us"]) for r in first}
    assert got == {2: ("within_1h", 1_800_000_000), 3: ("none", 0)}

    # batch 2: u1's touch state carries across the restart — a purchase
    # 2 days after the batch-1 click lands in 'older'
    _write_events(events, "b2.json", [typed(4, 1, _ts(3, 10), "purchase")])
    second = drain_collect(streaming_attribution(event_stream(spark, events)), ckpt)
    got2 = {r["event_id"]: r["touch_bucket"] for r in second}
    assert got2 == {4: "older"}


def test_streaming_anomalies_flag_against_prior_state(spark, tmp_path):
    from geostore_spark.streaming.windows import streaming_anomalies

    events = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt_anom")

    # batch 1: a stable baseline (values 10 ± 1) — nothing can flag while
    # n < ANOMALY_MIN_N, and nothing here is extreme anyway
    base = [
        _event(i, 1, _ts(1, i % 24), value=10.0 + (1.0 if i % 2 else -1.0))
        for i in range(12)
    ]
    _write_events(events, "b1.json", base)
    first = drain_collect(streaming_anomalies(event_stream(spark, events)), ckpt)
    assert first == []

    # batch 2: a spike far outside the baseline flags against the STORED
    # state from batch 1 (the state survived the restart), a normal value
    # does not
    _write_events(
        events,
        "b2.json",
        [_event(100, 1, _ts(2), value=50.0), _event(101, 1, _ts(2), value=10.0)],
    )
    second = drain_collect(streaming_anomalies(event_stream(spark, events)), ckpt)
    assert [r["event_id"] for r in second] == [100]
    assert second[0]["z"] > 3 and second[0]["value"] == 50.0


def test_streaming_retention_emits_month_increments_once(spark, tmp_path):
    from geostore_spark.streaming.windows import streaming_retention

    events = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: u1 active in March (cohort) twice — one increment only;
    # u2's cohort starts in April
    _write_events(
        events,
        "b1.json",
        [
            _event(1, 1, _ts(1)),
            _event(2, 1, _ts(20)),
            {**_event(3, 2, _ts(1)),
             "ts": datetime(2026, 4, 2, tzinfo=timezone.utc).isoformat()},
        ],
    )
    first = drain_collect(streaming_retention(event_stream(spark, events)), ckpt)
    got = {(r["user_id"], r["cohort_m"], r["months_since"]) for r in first}
    m_mar, m_apr = 2026 * 12 + 3, 2026 * 12 + 4
    assert got == {(1, m_mar, 0), (2, m_apr, 0)}

    # batch 2: u1 returns in April (new offset 1) and again in March (bit
    # already set -> no re-emission); state carried across the restart
    _write_events(
        events,
        "b2.json",
        [
            {**_event(4, 1, _ts(1)),
             "ts": datetime(2026, 4, 15, tzinfo=timezone.utc).isoformat()},
            _event(5, 1, _ts(25)),
        ],
    )
    second = drain_collect(streaming_retention(event_stream(spark, events)), ckpt)
    got2 = {(r["user_id"], r["cohort_m"], r["months_since"]) for r in second}
    assert got2 == {(1, m_mar, 1)}


def test_streaming_event_gap_matches_batch_lag(spark, tmp_path):
    from geostore_spark.streaming.windows import streaming_event_gap

    events = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: u1 has two events 1h apart -> one gap row (the first event
    # of a user emits nothing); u2 has a single event -> nothing
    _write_events(
        events,
        "b1.json",
        [_event(1, 1, _ts(1, 5)), _event(2, 1, _ts(1, 6)), _event(3, 2, _ts(1, 7))],
    )
    first = drain_collect(streaming_event_gap(event_stream(spark, events)), ckpt)
    assert [(r["event_id"], r["gap_us"]) for r in first] == [(2, 3_600_000_000)]

    # batch 2: the LAG pointer survives the restart — u2's next event a
    # day later emits exactly the cross-batch gap
    _write_events(events, "b2.json", [_event(4, 2, _ts(2, 7))])
    second = drain_collect(streaming_event_gap(event_stream(spark, events)), ckpt)
    assert [(r["user_id"], r["event_id"], r["gap_us"]) for r in second] == [
        (2, 4, 86_400_000_000)
    ]


def test_streaming_exact_dedup_keeps_one_per_digest(spark, tmp_path):
    import json as _json

    from geostore_spark.streaming.windows import doc_stream, streaming_exact_dedup

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    rows = [
        {"doc_id": 1, "text": "alpha beta", "ts": "2024-01-01T00:00:00Z"},
        {"doc_id": 2, "text": "alpha beta", "ts": "2024-01-01T00:05:00Z"},
        {"doc_id": 3, "text": "gamma delta", "ts": "2024-01-01T00:10:00Z"},
        {"doc_id": 4, "text": "gamma delta", "ts": "2024-01-01T00:11:00Z"},
        {"doc_id": 5, "text": "unique text", "ts": "2024-01-01T00:12:00Z"},
    ]
    (docs_dir / "batch0.json").write_text(
        "\n".join(_json.dumps(r) for r in rows)
    )
    out = drain_collect(
        streaming_exact_dedup(doc_stream(spark, str(docs_dir))),
        str(tmp_path / "ckpt"),
    )
    texts = sorted(r["text"] for r in out)
    assert texts == ["alpha beta", "gamma delta", "unique text"]
    assert len({r["digest"] for r in out}) == 3


def test_streaming_incremental_dedup_screens_against_corpus(spark, tmp_path):
    import json as _json

    from geostore_spark.streaming.windows import (
        doc_stream,
        streaming_incremental_dedup,
    )

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon phi chi")
    corpus = spark.createDataFrame(
        [(100, base), (101, "totally different corpus text here")],
        "doc_id long, text string",
    )

    def doc(doc_id, text):
        return {"doc_id": doc_id, "text": text, "ts": _ts(1, doc_id % 12)}

    # doc 1 = exact copy (also near); doc 2 = one word changed (near
    # only); doc 3 = novel (no hits at all)
    (docs_dir / "b1.json").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                doc(1, base),
                doc(2, base.replace("epsilon", "EPSILON")),
                doc(3, "completely novel words that match nothing at all"),
            ]
        )
    )
    rows = drain_collect(
        streaming_incremental_dedup(doc_stream(spark, str(docs_dir)), corpus),
        ckpt,
    )
    hits = {(r["doc_id"], r["hit"]) for r in rows}
    assert (1, "exact") in hits
    assert (1, "near") in hits  # identical text trivially band-collides
    assert (2, "near") in hits and (2, "exact") not in hits
    assert not any(d == 3 for d, _ in hits)


def test_stateless_signature_matches_batch_signatures(spark):
    from pyspark.sql import functions as F

    from geostore_spark.operators.dedup import (
        minhash_signature_col,
        minhash_signatures,
        shingle_hashes_col,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "one two three four")],
        "doc_id long, text string",
    )
    batch = {
        r["doc_id"]: r["sig"]
        for r in minhash_signatures(df, "doc_id", "text").collect()
    }
    stateless = {
        r["doc_id"]: r["sig"]
        for r in df.withColumn("hh", shingle_hashes_col("text"))
        .select("doc_id", minhash_signature_col("hh").alias("sig"))
        .collect()
    }
    assert batch == stateless


def test_streaming_bm25_scores_against_corpus_stats(spark, tmp_path):
    import json as _json

    from geostore_spark.streaming.windows import doc_stream, streaming_bm25

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    corpus = spark.createDataFrame(
        [
            (100, "customer table spark join"),
            (101, "window spark row scan"),
            (102, "value sort merge hash"),
        ],
        "doc_id long, text string",
    )

    def doc(doc_id, text):
        return {"doc_id": doc_id, "text": text, "ts": _ts(1, doc_id % 12)}

    # doc 1 hits 'customer' (df=1) twice and 'spark' (df=2) once;
    # doc 2 hits nothing from the query set
    (docs_dir / "b1.json").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                doc(1, "customer customer spark big"),
                doc(2, "merge hash sort"),
            ]
        )
    )
    rows = drain_collect(
        streaming_bm25(doc_stream(spark, str(docs_dir)), corpus), ckpt
    )
    hits = {}
    for r in rows:
        hits.setdefault((r["doc_id"], r["t"]), []).append(r)
    assert set(hits) == {(1, "customer"), (1, "spark")}
    assert len(hits[(1, "customer")]) == 2  # tf folds downstream from raw hits
    # idf is quantized from the STATIC corpus stats: N=3, df(customer)=1
    import math

    expect_idf = round(1e6 * math.log((3 - 1 + 0.5) / (1 + 0.5) + 1.0))
    assert hits[(1, "customer")][0]["idf_q"] == expect_idf
    assert all(r["dl"] == 4 for r in hits[(1, "customer")])


def test_streaming_psi_drift_flags_shifted_distribution(spark, tmp_path):
    from geostore_spark.streaming.windows import streaming_psi_drift

    events = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    # batch 1: 20 low values for 'click' (freeze as reference) and 20
    # low values for 'view'
    rows = []
    for i in range(20):
        rows.append({"event_id": i, "user_id": 1, "event_type": "click",
                     "value": 5.0 + i % 10, "ts": _ts(1, 1)})
        rows.append({"event_id": 100 + i, "user_id": 1, "event_type": "view",
                     "value": 5.0 + i % 10, "ts": _ts(1, 1)})
    _write_events(events, "b1.json", rows)
    first = drain_collect(
        streaming_psi_drift(event_stream(spark, events)), ckpt, output_mode="update"
    )
    by_key = {r["event_type"]: r for r in first}
    assert by_key["click"]["n_ref"] == 20 and by_key["click"]["n_cur"] == 0

    # batch 2: 'click' values SHIFT to the high buckets, 'view' stays —
    # click's PSI must scream, view's must stay near zero
    rows2 = []
    for i in range(20):
        rows2.append({"event_id": 200 + i, "user_id": 1, "event_type": "click",
                      "value": 85.0 + i % 10, "ts": _ts(1, 2)})
        rows2.append({"event_id": 300 + i, "user_id": 1, "event_type": "view",
                      "value": 5.0 + i % 10, "ts": _ts(1, 2)})
    _write_events(events, "b2.json", rows2)
    second = drain_collect(
        streaming_psi_drift(event_stream(spark, events)), ckpt, output_mode="update"
    )
    by_key2 = {r["event_type"]: r for r in second}
    assert by_key2["click"]["n_cur"] == 20
    assert by_key2["view"]["n_cur"] == 20
    # view's current histogram replays its reference exactly: stable
    # distribution, zero degenerate buckets, PSI ~ 0
    assert by_key2["view"]["psi"] < 0.05
    assert by_key2["view"]["n_degenerate"] == 0
    # click shifted ENTIRELY out of its reference buckets: every populated
    # bucket is one-sided, which is the total-shift signal the batch
    # x_stats_psi_drift surfaces the same way (n_degenerate, guarded PSI)
    assert by_key2["click"]["n_degenerate"] == 4  # 2 ref + 2 cur buckets
    assert by_key2["click"]["n_degenerate"] > by_key2["view"]["n_degenerate"]


def test_streaming_markov_matches_batch_transitions(spark, tmp_path):
    from geostore_spark.streaming.windows import streaming_markov

    events = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")

    # u1: click -> view -> click ; u2: signup (no transition yet)
    _write_events(
        events,
        "b1.json",
        [
            {**_event(1, 1, _ts(1, 5)), "event_type": "click"},
            {**_event(2, 1, _ts(1, 6)), "event_type": "view"},
            {**_event(3, 1, _ts(1, 7)), "event_type": "click"},
            {**_event(4, 2, _ts(1, 8)), "event_type": "signup"},
        ],
    )
    first = drain_collect(streaming_markov(event_stream(spark, events)), ckpt)
    got = {(r["user_id"], r["prev"], r["next"], r["n"]) for r in first}
    assert got == {(1, "click", "view", 1), (1, "view", "click", 1)}

    # the last-type pointer survives the restart: u2's next event emits
    # the cross-batch transition
    _write_events(
        events, "b2.json", [{**_event(5, 2, _ts(2, 8)), "event_type": "purchase"}]
    )
    second = drain_collect(streaming_markov(event_stream(spark, events)), ckpt)
    assert {(r["user_id"], r["prev"], r["next"], r["n"]) for r in second} == {
        (2, "signup", "purchase", 1)
    }


def test_streaming_parquet_sink_is_exactly_once_across_restarts(spark, tmp_path):
    """File-sink exactly-once: the checkpoint's committed-batch log plus
    the sink's file manifest mean a restart neither re-emits batch 1's
    rows nor loses batch 2's — the durable-output contract the
    reference's append-only catalog sink (S11) relies on."""
    from geostore_spark.streaming.windows import event_stream

    events = str(tmp_path / "events")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            event_stream(spark, events)
            .select("event_id", "user_id", "event_type")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_events(events, "b1.json", [_event(1, 1, _ts(1)), _event(2, 2, _ts(1, 1))])
    run_once()
    got1 = {r["event_id"] for r in spark.read.parquet(out).collect()}
    assert got1 == {1, 2}

    # restart from the same checkpoint with one new file: batch 1 must
    # not duplicate, batch 2 must land
    _write_events(events, "b2.json", [_event(3, 1, _ts(2))])
    run_once()
    rows = spark.read.parquet(out).collect()
    assert sorted(r["event_id"] for r in rows) == [1, 2, 3]


def test_transform_with_state_peak_tracker(spark, tmp_path):
    """Per-user high-watermark state survives restarts in the RocksDB
    store; only record-setting events emit. ``api="auto"`` dispatches to
    transformWithStateInPandas where google.protobuf exists and to the
    equivalent applyInPandasWithState engine where it doesn't — the
    operator is exercised (not skipped) in both environments."""
    from geostore_spark.streaming.windows import streaming_peak_tracker

    events = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        _write_events(
            events,
            "b1.json",
            [
                _event(1, 1, _ts(1, 5), value=1.0),
                _event(2, 1, _ts(1, 6), value=3.0),
                _event(3, 1, _ts(1, 7), value=2.0),  # below peak → no emit
            ],
        )
        first = drain_collect(streaming_peak_tracker(event_stream(spark, events)), ckpt)
        assert [(r["event_id"], r["value"]) for r in first] == [(1, 1.0), (2, 3.0)]

        # restart: the 3.0 watermark persists — only 4.0 emits
        _write_events(
            events,
            "b2.json",
            [_event(4, 1, _ts(2), value=2.5), _event(5, 1, _ts(2, 1), value=4.0)],
        )
        second = drain_collect(streaming_peak_tracker(event_stream(spark, events)), ckpt)
        assert [(r["event_id"], r["value"]) for r in second] == [(5, 4.0)]
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_streaming_rolling_anomaly_matches_batch_contract(spark, tmp_path):
    """Streaming twin of x_events_rolling_anomaly: daily microbatches,
    per-type trailing-7-day 2-sigma flags with the identical integer
    cross-multiplied test; each closed day emits exactly once across
    restarts (the last_emitted watermark survives in the state store)."""
    import math

    from geostore_spark.streaming.windows import streaming_rolling_anomaly

    events = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")

    # 8 quiet days then one 100x spike on day 9; day N closes when day
    # N+1 arrives
    values = [10.0, 11.0, 10.0, 12.0, 11.0, 10.0, 11.0, 10.0, 1000.0, 10.0]
    for i, v in enumerate(values, start=1):
        _write_events(events, f"b{i}.json", [_event(i, 1, _ts(i), value=v)])
    got = drain_collect(streaming_rolling_anomaly(event_stream(spark, events)), ckpt)
    flags = {r["day"]: (r["cents"], r["is_anomaly"]) for r in got}
    # replicate the batch contract in plain python
    cents = [math.floor(v * 100) for v in values]
    expect = {}
    for i in range(len(cents) - 1):  # last day still open
        win = cents[max(0, i - 7):i]
        n, s, ss = len(win), sum(win), sum(x * x for x in win)
        anom = n == 7 and (n * cents[i] - s) ** 2 > 4 * (n * ss - s * s)
        expect[_ts(i + 1)[:10]] = (cents[i], anom)
    assert flags == expect
    # the spike day flags, its quiet predecessor does not
    assert flags[_ts(9)[:10]][1] is True
    assert flags[_ts(8)[:10]][1] is False

    # restart with one more day: only the newly closed day emits
    _write_events(events, "b11.json", [_event(11, 1, _ts(11), value=10.0)])
    second = drain_collect(
        streaming_rolling_anomaly(event_stream(spark, events)), ckpt
    )
    assert [r["day"] for r in second] == [_ts(10)[:10]]


def test_streaming_changepoint_converges_to_batch_rule(spark, tmp_path):
    """Streaming twin of x_events_changepoint: the (day -> count) state
    is rollup-bounded, each microbatch emits the current CUSUM argmax,
    and the final emission equals the batch integer rule. A restart
    resumes from the state store and stays consistent."""
    from geostore_spark.streaming.windows import streaming_changepoint

    events = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")

    # level shift after day 4: 2 events/day then 6/day
    per_day = [2, 2, 2, 2, 6, 6, 6]
    eid = 0
    for i, n in enumerate(per_day, start=1):
        rows = []
        for j in range(n):
            eid += 1
            rows.append(_event(eid, 1, _ts(i, hour=j + 1)))
        _write_events(events, f"b{i}.json", rows)

    got = drain_collect(streaming_changepoint(event_stream(spark, events)), ckpt)
    assert len(got) >= 1
    final = got[-1]

    # replicate the batch rule in plain python
    counts = per_day
    total, n_days = sum(counts), len(counts)
    cum, best = 0, None
    for rk, c in enumerate(counts, start=1):
        cum += c
        s = abs(n_days * cum - rk * total)
        if best is None or s > best[1]:
            best = (rk, s)
    assert final["cp_day"] == _ts(best[0])[:10]
    assert final["n_days"] == n_days
    assert final["total_events"] == total
    assert final["cusum_abs"] == best[1]

    # restart with one more quiet day: the resumed state keeps history
    _write_events(events, "b8.json", [_event(eid + 1, 1, _ts(8, hour=1))])
    second = drain_collect(streaming_changepoint(event_stream(spark, events)), ckpt)
    assert second[-1]["total_events"] == total + 1
    assert second[-1]["n_days"] == n_days + 1


def test_streaming_kendall_matches_pair_rule(spark, tmp_path):
    """Streaming twin of x_stats_kendall_tau: the (day -> (count,
    cents)) state is rollup-bounded, each microbatch emits the current
    exact pair counts, and the final emission equals the batch integer
    rule. A restart resumes from the state store."""
    from geostore_spark.streaming.windows import streaming_kendall

    events = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")

    # day i has i events of value 10*i -> x and y strictly concordant
    # except day 4, which breaks the monotone pattern in y
    per_day = {1: (1, 10.0), 2: (2, 20.0), 3: (3, 30.0), 4: (4, 5.0)}
    eid = 0
    for i, (n, val) in per_day.items():
        rows = []
        for j in range(n):
            eid += 1
            rows.append(_event(eid, 1, _ts(i, hour=j + 1), value=val))
        _write_events(events, f"b{i}.json", rows)

    got = drain_collect(streaming_kendall(event_stream(spark, events)), ckpt)
    final = got[-1]

    pts = sorted(
        (i, (n, round(n * v * 100))) for i, (n, v) in per_day.items()
    )
    vals = [p for _, p in pts]
    nc = nd = n1 = n2 = 0
    for a in range(len(vals)):
        for b in range(a + 1, len(vals)):
            (xa, ya), (xb, yb) = vals[a], vals[b]
            nc += (xa < xb and ya < yb) or (xa > xb and ya > yb)
            nd += (xa < xb and ya > yb) or (xa > xb and ya < yb)
            n1 += xa == xb
            n2 += ya == yb
    n0 = len(vals) * (len(vals) - 1) // 2
    assert final["n_days"] == len(vals)
    assert final["nc"] == nc and final["nd"] == nd
    assert final["n1"] == n1 and final["n2"] == n2
    assert final["tau_q"] == round(
        1_000_000 * (nc - nd) / (((n0 - n1) * (n0 - n2)) ** 0.5)
    )

    # restart with a day that strictly dominates every prior day in
    # BOTH count and cents — all 4 new pairs concordant
    _write_events(
        events, "b9.json",
        [_event(eid + 1 + j, 1, _ts(9, hour=j + 1), value=50.0)
         for j in range(5)],
    )
    second = drain_collect(streaming_kendall(event_stream(spark, events)), ckpt)
    assert second[-1]["n_days"] == len(vals) + 1
    assert second[-1]["nc"] == nc + len(vals)


def test_running_totals_invariant_under_random_batch_splits(spark, tmp_path):
    """Split-invariance fuzz for the custom stateful operator: the SAME
    seeded event set, delivered as randomly-sized microbatches in
    random within-batch order across separate drains (checkpoint
    restarts between them), must end at exactly the per-user totals a
    plain batch aggregation computes — state folding cannot depend on
    how the stream happened to be chopped."""
    import random

    rng = random.Random(4242)
    all_events = [
        _event(i, rng.choice([7, 8, 9]), _ts(1 + i // 12, i % 12), float(rng.randint(1, 9)))
        for i in range(36)
    ]

    events_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    final: dict[int, tuple] = {}
    i = 0
    b = 0
    while i < len(all_events):
        size = rng.randint(1, 7)
        batch = list(all_events[i : i + size])
        rng.shuffle(batch)
        i += size
        _write_events(events_dir, f"rb{b}.json", batch)
        b += 1
        # drain after every 1-2 files: separate drains = checkpoint
        # restarts, multiple files per drain = multi-batch folding
        if rng.random() < 0.6 or i >= len(all_events):
            for r in drain_collect(
                running_user_totals(event_stream(spark, events_dir)),
                ckpt,
                "update",
            ):
                final[r["user_id"]] = (
                    r["n_events"], r["sum_value"], r["last_ts"],
                )

    from collections import defaultdict
    want: dict[int, list] = defaultdict(list)
    for e in all_events:
        want[e["user_id"]].append(e)
    for uid, evs in want.items():
        n, s, last = final[uid]
        assert n == len(evs)
        assert s == round(sum(e["value"] for e in evs), 4)
        assert last.isoformat() + "+00:00" == max(e["ts"] for e in evs)
