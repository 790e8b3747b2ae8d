"""Streaming window aggregation + custom stateful operators.

The reference has no tumbling/sliding/session windows or watermark
semantics (SURVEY §2.9) — its "streaming" is Step-Function orchestration.
These extend the engine's event surface to real Structured Streaming:

- ``streaming_tumbling_counts``: watermarked tumbling-window aggregate.
  Late events beyond the watermark are dropped; the same expression
  shape as operators/windows.py:win_tumbling, so batch and streaming
  share semantics (the Spark contract).
- ``running_user_totals``: custom stateful operator via
  ``applyInPandasWithState`` — per-key state (event count, value sum,
  last-seen timestamp) maintained across micro-batches. This is the
  pattern slot for any stateful op the built-ins can't express
  (sessionization with custom gap logic, per-dataset import-status
  machines mirroring the reference's poll loop, SURVEY §2.9 T3).

Scale note: state is partitioned by the grouping key across executors
and checkpointed via the state store — the same mechanics that carry a
1000-executor cluster; nothing here is driver-resident.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = "event_id long, user_id long, event_type string, value double, ts timestamp"

RUNNING_TOTALS_SCHEMA = "user_id long, n_events long, sum_value double, last_ts timestamp"
_STATE_SCHEMA = "n_events long, sum_value double, last_ts_epoch long"


def event_stream(spark: SparkSession, events_dir: str, watermark: str = "1 hour") -> DataFrame:
    """File-source stream of event JSON with an event-time watermark."""
    return spark.readStream.schema(EVENT_SCHEMA).json(events_dir).withWatermark("ts", watermark)


def streaming_tumbling_counts(
    stream: DataFrame, window: str = "1 day"
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type. In append mode a
    window emits once its end passes the watermark; events later than the
    watermark are dropped — the late-data contract the reference's FIFO
    dedup window only approximates."""
    return (
        stream.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_v"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "sum_v")
    )


def streaming_session_counts(
    stream: DataFrame, gap: str = "30 minutes"
) -> DataFrame:
    """Watermarked session-window aggregate per user: Spark merges
    events closer than ``gap`` into one session whose window grows until
    a quiet period; a session emits once the watermark passes its end.
    Same ``session_window`` expression as the batch
    operators/windows.py:win_session, so backfill and live sessions
    agree — the streaming twin of the gaps-and-islands batch op, with
    the state store doing the island merging incrementally."""
    return (
        stream.groupBy(
            F.session_window("ts", gap).alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            "n_events",
        )
    )


def _update_running_totals(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user accumulator: fold each micro-batch into (n, sum, last_ts)."""
    n, total, last_epoch = state.get if state.exists else (0, 0.0, 0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_epoch = max(last_epoch, int(pdf["ts"].max().timestamp() * 1_000_000))
    state.update((n, total, last_epoch))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [round(total, 4)],
            "last_ts": [pd.Timestamp(last_epoch, unit="us")],
        }
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running totals across batches
    (applyInPandasWithState; update output mode)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def drain_collect(
    stream_df: DataFrame, checkpoint_dir: str, output_mode: str = "append"
) -> list:
    """Run one availableNow drain of ``stream_df`` and return the emitted
    rows (foreachBatch sink — supports checkpoint recovery in every
    output mode, unlike the memory sink)."""
    rows: list = []

    def collect_batch(batch_df: DataFrame, _batch_id: int) -> None:
        rows.extend(batch_df.collect())

    query = (
        stream_df.writeStream.foreachBatch(collect_batch)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return rows


ANOMALY_SCHEMA = "event_id long, event_type string, value double, z double"
_ANOM_STATE_SCHEMA = "n long, mean double, m2 double"
ANOMALY_MIN_N = 10
ANOMALY_Z = 3.0


def _update_anomalies(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Online z-score anomaly detection per event_type: Welford running
    (n, mean, M2) state; an event is scored against the statistics of
    everything BEFORE it (so a level shift flags immediately rather than
    polluting its own baseline), then folded in. Emits only events with
    |z| > ANOMALY_Z once at least ANOMALY_MIN_N values have been seen —
    the streaming twin of the batch x_stats_zscore profile."""
    n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
    out: list[pd.DataFrame] = []
    for pdf in batches:
        if not len(pdf):
            continue
        pdf = pdf.sort_values("event_id")  # deterministic intra-batch order
        flag_ids, flag_vals, flag_z = [], [], []
        for eid, v in zip(pdf["event_id"], pdf["value"]):
            v = float(v)
            if n >= ANOMALY_MIN_N:
                var = m2 / n
                if var > 0:
                    z = (v - mean) / var**0.5
                    if abs(z) > ANOMALY_Z:
                        flag_ids.append(int(eid))
                        flag_vals.append(v)
                        flag_z.append(z)
            n += 1
            delta = v - mean
            mean += delta / n
            m2 += delta * (v - mean)
        if flag_ids:
            out.append(
                pd.DataFrame(
                    {
                        "event_id": flag_ids,
                        "event_type": key[0],
                        "value": flag_vals,
                        "z": flag_z,
                    }
                )
            )
    state.update((n, mean, m2))
    yield from out or [
        pd.DataFrame({"event_id": [], "event_type": [], "value": [], "z": []}).astype(
            {"event_id": "int64", "event_type": "object", "value": "float64", "z": "float64"}
        )
    ]


def streaming_anomalies(stream: DataFrame) -> DataFrame:
    """Custom stateful operator: per-event_type online outlier stream
    (applyInPandasWithState; append mode — each anomaly emits once)."""
    return stream.groupBy("event_type").applyInPandasWithState(
        _update_anomalies,
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=_ANOM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FUNNEL_SCHEMA = "user_id long, days_to_convert long"
_FUNNEL_STATE_SCHEMA = "s_ts_epoch long, converted boolean"
_US_PER_DAY = 86_400_000_000


def _update_funnel(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user signup->purchase state machine: remember the first signup,
    emit exactly one conversion row at the first purchase at-or-after it.
    State is two scalars per user regardless of event volume."""
    s_epoch, converted = state.get if state.exists else (0, False)
    days: list[int] = []
    for pdf in batches:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts", "event_id"])  # deterministic in-batch order
        for et, ts in zip(pdf["event_type"], pdf["ts"]):
            epoch = int(pd.Timestamp(ts).value) // 1_000  # ns -> us
            if et == "signup" and s_epoch == 0:
                s_epoch = epoch
            elif (
                et == "purchase"
                and s_epoch
                and not converted
                and epoch >= s_epoch
            ):
                converted = True
                days.append((epoch - s_epoch) // _US_PER_DAY)
    state.update((s_epoch, converted))
    yield pd.DataFrame(
        {"user_id": [key[0]] * len(days), "days_to_convert": days}
    ).astype({"user_id": "int64", "days_to_convert": "int64"})


def streaming_funnel(stream: DataFrame) -> DataFrame:
    """Streaming twin of ``operators.retention.q_funnel``: per-user
    conversion detection via ``applyInPandasWithState`` (append mode —
    each conversion emits exactly once, across any micro-batch split).

    Agrees with the batch funnel whenever each user's events arrive in
    event-time order across batches (in-batch disorder is sorted away);
    a purchase arriving in an earlier batch than an older signup is
    scored against the signups seen so far — the inherent one-pass
    relaxation of the batch "first purchase at-or-after first signup".
    State per user is two scalars, so 10^9 users is a bounded,
    key-partitioned state store — never a driver structure.
    """
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_funnel,
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ATTRIBUTION_SCHEMA = "user_id long, event_id long, touch_bucket string, latency_us long"
_ATTR_STATE_SCHEMA = "touch_epoch long"


def _update_attribution(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user last-touch pointer: clicks/views update one epoch scalar;
    each purchase emits its attribution row immediately, bucketed by
    recency — the streaming twin of the batch running-MAX window."""
    (touch,) = state.get if state.exists else (0,)
    ids: list[int] = []
    buckets: list[str] = []
    lats: list[int] = []
    for pdf in batches:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        for eid, et, ts in zip(pdf["event_id"], pdf["event_type"], pdf["ts"]):
            epoch = int(pd.Timestamp(ts).value) // 1_000  # ns -> us
            if et in ("click", "view"):
                touch = max(touch, epoch)
            elif et == "purchase":
                if touch == 0:
                    buckets.append("none")
                    lats.append(0)
                else:
                    lat = epoch - touch
                    lats.append(lat)
                    if lat <= 3_600_000_000:
                        buckets.append("within_1h")
                    elif lat <= 86_400_000_000:
                        buckets.append("within_1d")
                    else:
                        buckets.append("older")
                ids.append(int(eid))
    state.update((touch,))
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(ids),
            "event_id": ids,
            "touch_bucket": buckets,
            "latency_us": lats,
        }
    ).astype(
        {
            "user_id": "int64",
            "event_id": "int64",
            "touch_bucket": "object",
            "latency_us": "int64",
        }
    )


def streaming_attribution(stream: DataFrame) -> DataFrame:
    """Streaming twin of ``operators.windows.win_attribution``: per-user
    last-touch attribution via ``applyInPandasWithState`` (append mode —
    one row per purchase as it arrives). State is one epoch scalar per
    user; agrees with the batch window whenever each user's events
    arrive in event-time order across micro-batches."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_attribution,
        outputStructType=ATTRIBUTION_SCHEMA,
        stateStructType=_ATTR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


RETENTION_SCHEMA = "user_id long, cohort_m long, months_since long"
# cohort month index + bitmask of months-seen relative to the cohort; 64
# bits bound the horizon (5+ years of offsets) so state per user is two
# scalars regardless of event volume
_RETENTION_STATE_SCHEMA = "cohort_m long, months_mask long"
_RETENTION_HORIZON = 64


def _update_retention(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user cohort state: the first event pins the cohort month; each
    event's month sets a bit in the months-seen mask, and a freshly-set
    bit emits exactly one (user, cohort_m, months_since) increment row.
    The streaming twin of the batch x_events_retention per-user state —
    the (cohort, offset)->COUNT DISTINCT rollup is a foreachBatch
    concern (streaming aggregation has no exact count-distinct); summed
    increments equal the batch triangle whenever each user's events
    arrive in event-time order across micro-batches (in-batch disorder
    is sorted away)."""
    cohort_m, mask = state.get if state.exists else (0, 0)
    offs: list[int] = []
    for pdf in batches:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts in pdf["ts"]:
            t = pd.Timestamp(ts)
            m = t.year * 12 + t.month
            if cohort_m == 0:
                cohort_m = m
            off = m - cohort_m
            if 0 <= off < _RETENTION_HORIZON and not (mask >> off) & 1:
                mask |= 1 << off
                offs.append(off)
    state.update((cohort_m, mask))
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(offs),
            "cohort_m": [cohort_m] * len(offs),
            "months_since": offs,
        }
    ).astype({"user_id": "int64", "cohort_m": "int64", "months_since": "int64"})


def streaming_retention(stream: DataFrame) -> DataFrame:
    """Streaming twin of ``operators.retention.q_retention``: per-user
    cohort + months-active increments via ``applyInPandasWithState``
    (append mode — each (user, month-offset) emits exactly once across
    any micro-batch split). State is two longs per user — a 10^9-user
    store stays key-partitioned and bounded; nothing driver-resident."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_retention,
        outputStructType=RETENTION_SCHEMA,
        stateStructType=_RETENTION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EVENT_GAP_SCHEMA = "user_id long, event_id long, event_type string, gap_us long"
_EVENT_GAP_STATE_SCHEMA = "last_epoch long"


def _update_event_gap(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user LAG pointer: one epoch scalar of state; every event after
    the first emits its gap to the previous event, tagged with the LATER
    event's type — the streaming twin of the batch x_win_event_gap
    window. Agrees with batch LAG whenever each user's events arrive in
    event-time order across micro-batches."""
    (last,) = state.get if state.exists else (0,)
    ids: list[int] = []
    types: list[str] = []
    gaps: list[int] = []
    for pdf in batches:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        for eid, et, ts in zip(pdf["event_id"], pdf["event_type"], pdf["ts"]):
            epoch = int(pd.Timestamp(ts).value) // 1_000  # ns -> us
            if last:
                ids.append(int(eid))
                types.append(et)
                gaps.append(epoch - last)
            last = epoch
    state.update((last,))
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(ids),
            "event_id": ids,
            "event_type": types,
            "gap_us": gaps,
        }
    ).astype(
        {
            "user_id": "int64",
            "event_id": "int64",
            "event_type": "object",
            "gap_us": "int64",
        }
    )


def streaming_event_gap(stream: DataFrame) -> DataFrame:
    """Streaming twin of ``operators.windows.win_event_gap``: per-user
    inter-event gaps via ``applyInPandasWithState`` (append mode — one
    row per consecutive pair, as the later event arrives). The
    per-event_type rollup (n/sum/max/avg) is a downstream foreachBatch
    aggregate; summed over batches the gap rows equal the batch window's
    LAG output."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_event_gap,
        outputStructType=EVENT_GAP_SCHEMA,
        stateStructType=_EVENT_GAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DOC_STREAM_SCHEMA = "doc_id long, text string, ts timestamp"


def doc_stream(
    spark: SparkSession, docs_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """File-source stream of document JSON with an event-time watermark."""
    return (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .json(docs_dir)
        .withWatermark("ts", watermark)
    )


def streaming_decontaminate(
    stream: DataFrame, bench_docs: DataFrame, n: int = 8
) -> DataFrame:
    """Streaming twin of ``operators.text.text_decontaminate``: incoming
    documents are shingled per micro-batch (stateless Arrow pass) and
    checked against the STATIC benchmark gram set via a stream-static
    broadcast join — the live-ingest contamination tap.

    Emits raw hit rows (doc_id, h, bench_id); per-doc distinct-gram
    rollups are a ``foreachBatch`` concern because streaming aggregation
    does not support exact COUNT(DISTINCT) — summed over batches the
    hits equal the batch operator's join output. The benchmark side
    broadcasts once and the 100 TB/day ingest side never shuffles,
    exactly the batch plan's shape."""
    from geostore_spark.operators.dedup import shingle_rows

    bench_grams = shingle_rows(bench_docs, "doc_id", "text", n).select(
        F.col("doc_id").alias("bench_id"), F.xxhash64("s").alias("h")
    )
    grams = shingle_rows(stream, "doc_id", "text", n, rebalance=False).select(
        "doc_id", F.xxhash64("s").alias("h")
    )
    return grams.join(F.broadcast(bench_grams), "h").select(
        "doc_id", "h", "bench_id"
    )


def streaming_incremental_dedup(
    stream: DataFrame, corpus: DataFrame
) -> DataFrame:
    """Streaming twin of ``operators.dedup.q_incremental_dedup``: each
    arriving document is screened against the STATIC standing corpus —
    exact via content digest, near via MinHash-LSH band buckets — through
    stream-static broadcast joins only. The corpus digest/band tables
    build once and broadcast; the ingest side stays stateless (per-row
    signature expressions, no streaming aggregation, no stream-stream
    join), so arrivals cost per-batch work proportional to the batch.

    Emits RAW hit rows (doc_id, hit ∈ {exact, near}) — a doc may emit
    several near rows (one per colliding band) and none if novel; the
    per-doc keep/drop verdict is a ``foreachBatch`` rollup, same division
    of labor as ``streaming_decontaminate``."""
    from geostore_spark.operators.dedup import (
        band_table,
        minhash_signature_col,
        minhash_signatures,
        shingle_hashes_col,
    )

    c_digest = corpus.select(
        F.md5(F.col("text").cast("binary")).alias("digest")
    ).distinct()
    c_bands = (
        band_table(minhash_signatures(corpus, "doc_id", "text"), "doc_id")
        .select("band", "bh")
        .distinct()
    )

    exact = (
        stream.select(
            "doc_id", F.md5(F.col("text").cast("binary")).alias("digest")
        )
        .join(F.broadcast(c_digest), "digest")
        .select("doc_id", F.lit("exact").alias("hit"))
    )
    # stream side: stateless per-row signature (a stateful groupBy
    # aggregation would stall behind the watermark); values match the
    # corpus-side batch signatures by construction
    s_bands = band_table(
        stream.select("doc_id", shingle_hashes_col("text").alias("hh"))
        .filter(F.size("hh") > 0)
        .select("doc_id", minhash_signature_col("hh").alias("sig")),
        "doc_id",
    )
    near = s_bands.join(F.broadcast(c_bands), ["band", "bh"]).select(
        "doc_id", F.lit("near").alias("hit")
    )
    return exact.unionByName(near)


def streaming_exact_dedup(stream: DataFrame) -> DataFrame:
    """Streaming twin of ``operators.dedup.exact_dedup``: the first
    document seen per content digest survives; later copies are dropped.

    ``dropDuplicatesWithinWatermark`` keys the state store on the digest
    and — unlike plain ``dropDuplicates`` — evicts entries once they age
    past the watermark, so state is bounded by the dedup horizon rather
    than growing with the corpus: the only formulation that survives an
    unbounded 100 TB/day ingest. Batch and streaming agree on the digest
    (md5 of the text), so a backfill and the live path dedup identically.
    """
    return stream.withColumn("digest", F.md5("text")).dropDuplicatesWithinWatermark(
        ["digest"]
    )


def streaming_bm25(stream: DataFrame, corpus: DataFrame) -> DataFrame:
    """Stream-static BM25 scoring tap: arriving documents are scored
    against query terms using corpus statistics (df per query term,
    N, avgdl) computed ONCE from the static reference corpus and
    broadcast — the live-retrieval twin of the batch ``x_text_bm25``.
    The ingest side is stateless: explode to query-term hits (the
    IN-list filter bounds the explosion to query terms), join the
    broadcast df table, score per (doc, term) with the same
    integer-quantized arithmetic as the batch operator, and emit raw
    (doc_id, t, sq) rows; the per-doc sum is a ``foreachBatch`` rollup
    (streaming aggregation would stall behind the watermark)."""
    from geostore_spark.operators.text import BM25_QUERY

    cd = corpus.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("dl")
    )
    stats_row = cd.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    ).first()
    n_docs, avgdl = stats_row["n_docs"], stats_row["avgdl"]
    df_tab = (
        corpus.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("t"))
        .filter(F.col("t").isin(*BM25_QUERY))
        .groupBy("t")
        .agg(F.count_distinct("doc_id").alias("df"))
    )

    s = stream.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("dl"),
        F.explode(F.split(F.col("text"), " ")).alias("t"),
    ).filter(F.col("t").isin(*BM25_QUERY))
    idf = F.log(
        (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    # raw hit rows carry (doc, term, dl, quantized idf); the foreachBatch
    # rollup counts tf per (doc, term) and applies the saturation
    # k1/b arithmetic — identical inputs to the batch operator, with
    # avgdl/k1/b as plain constants downstream
    return (
        s.join(F.broadcast(df_tab), "t")
        .select(
            "doc_id",
            "t",
            "dl",
            F.round(F.lit(1e6) * idf, 0).cast("bigint").alias("idf_q"),
            F.lit(avgdl).alias("avgdl"),
        )
    )


# -- streaming distribution drift (PSI) --------------------------------------

PSI_STREAM_BUCKETS = 10
PSI_REF_N = 20  # values per key that freeze into the reference histogram
DRIFT_SCHEMA = (
    "event_type string, n_ref long, n_cur long, psi double, n_degenerate long"
)
_DRIFT_STATE_SCHEMA = "ref array<long>, cur array<long>"


def _update_drift(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Streaming twin of the batch ``x_stats_psi_drift``: the first
    PSI_REF_N values per event_type freeze into a reference histogram;
    every later value accumulates into the current histogram, and each
    micro-batch emits the key's refreshed PSI. State is two fixed
    10-bucket count arrays — constant per key, so state size is
    O(keys), never O(events)."""
    if state.exists:
        ref, cur = [list(a) for a in state.get]
    else:
        ref, cur = [0] * PSI_STREAM_BUCKETS, [0] * PSI_STREAM_BUCKETS
    for pdf in batches:
        if not len(pdf):
            continue
        pdf = pdf.sort_values("event_id")  # deterministic intra-batch order
        for v in pdf["value"]:
            b = min(int(float(v) / (100.0 / PSI_STREAM_BUCKETS)), PSI_STREAM_BUCKETS - 1)
            if sum(ref) < PSI_REF_N:
                ref[b] += 1
            else:
                cur[b] += 1
    state.update((ref, cur))
    n_ref, n_cur = sum(ref), sum(cur)
    # Mirrors the batch x_stats_psi_drift contract exactly: PSI sums only
    # over buckets populated on BOTH sides, and the zero-overlap buckets —
    # where the classic formula degenerates to ±inf — surface as a count
    # the caller alerts on (10 degenerate buckets == total shift).
    psi = 0.0
    n_degenerate = 0
    if n_ref and n_cur:
        for r, c in zip(ref, cur):
            if r > 0 and c > 0:
                p, q = r / n_ref, c / n_cur
                psi += (p - q) * math.log(p / q)
            elif r > 0 or c > 0:
                n_degenerate += 1
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_ref": [n_ref],
            "n_cur": [n_cur],
            "psi": [round(psi, 6)],
            "n_degenerate": [n_degenerate],
        }
    )


def streaming_psi_drift(stream: DataFrame) -> DataFrame:
    """Custom stateful operator: per-event_type online PSI against a
    frozen reference window (applyInPandasWithState; update mode — each
    batch refreshes the key's drift score)."""
    return stream.groupBy("event_type").applyInPandasWithState(
        _update_drift,
        outputStructType=DRIFT_SCHEMA,
        stateStructType=_DRIFT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- streaming Markov transitions --------------------------------------------

MARKOV_SCHEMA = "user_id long, prev string, next string, n long"
_MARKOV_STATE_SCHEMA = "last_type string, last_epoch long"


def _update_markov(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user last-event-type pointer: each arriving event emits one
    (prev, next) transition increment against the previous event —
    the streaming twin of the batch x_events_markov LAG window. One
    scalar of state per user; summed over batches the increments equal
    the batch transition counts whenever each user's events arrive in
    event-time order."""
    last_type, last_epoch = state.get if state.exists else (None, 0)
    counts: dict[tuple[str, str], int] = {}
    # a microbatch may arrive as several Arrow chunks; (ts, event_id) order
    # only holds across the whole batch, so concatenate before sorting —
    # per-chunk sorting would count transitions in chunk order and diverge
    # from the batch LAG window this twin claims to reproduce
    chunks = [pdf for pdf in batches if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
        for et, ts in zip(pdf["event_type"], pdf["ts"]):
            epoch = int(pd.Timestamp(ts).value)
            if last_type is not None:
                k = (last_type, et)
                counts[k] = counts.get(k, 0) + 1
            last_type, last_epoch = et, epoch
    state.update((last_type, last_epoch))
    keys = sorted(counts)
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(keys),
            "prev": [k[0] for k in keys],
            "next": [k[1] for k in keys],
            "n": [counts[k] for k in keys],
        }
    ).astype({"user_id": "int64", "prev": "object", "next": "object", "n": "int64"})


def streaming_markov(stream: DataFrame) -> DataFrame:
    """Streaming twin of ``operators.temporal.q_events_markov``: per-user
    transition-count increments via ``applyInPandasWithState`` (append
    mode). The corpus-level matrix is a downstream foreachBatch rollup
    of the increments — SUM(n) GROUP BY (prev, next) over all emissions
    reproduces the batch transition table."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_markov,
        outputStructType=MARKOV_SCHEMA,
        stateStructType=_MARKOV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- streaming trailing-window anomaly flags ---------------------------------

ROLLANOM_SCHEMA = "event_type string, day string, cents long, is_anomaly boolean"
_ROLLANOM_STATE_SCHEMA = "days array<string>, cents array<long>, last_emitted string"
_ROLLANOM_LOOKBACK = 7


def _update_rolling_anomaly(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Streaming twin of ``operators.temporal.q_events_rolling_anomaly``:
    per-event-type trailing-7-day 2-sigma flags with the identical
    cross-multiplied integer test. State is the trailing (day, cents)
    tail — bounded by the lookback, not history. A day's flag emits when
    a LATER day arrives for that type (the close signal under the
    one-file-per-day test cadence); the still-open day stays in state."""
    if state.exists:
        days, cents_hist, last_emitted = state.get
        tail = dict(zip(list(days), list(cents_hist)))
    else:
        tail, last_emitted = {}, ""
    chunks = [pdf for pdf in batches if len(pdf)]
    out = []
    if chunks:
        pdf = pd.concat(chunks)
        pdf["day"] = pdf["ts"].dt.strftime("%Y-%m-%d")
        pdf["cents"] = (pdf["value"] * 100).apply(math.floor).astype("int64")
        daily = pdf.groupby("day")["cents"].sum().sort_index()
        for day, c in daily.items():
            tail[day] = tail.get(day, 0) + int(c)
        # every tracked day strictly before the newest is closed; emit
        # each closed day once (tracked via the last_emitted watermark)
        closed = set(sorted(tail)[:-1])
        hist: list[int] = []
        for day in sorted(tail):
            c = tail[day]
            if day in closed and day > last_emitted:
                win = hist[-_ROLLANOM_LOOKBACK:]
                n = len(win)
                s = sum(win)
                ss = sum(x * x for x in win)
                anom = n == _ROLLANOM_LOOKBACK and (n * c - s) ** 2 > 4 * (
                    n * ss - s * s
                )
                out.append((key[0], day, c, bool(anom)))
                last_emitted = day
            hist.append(c)
        # keep the open day plus the lookback tail behind it
        keep = sorted(tail)[-(_ROLLANOM_LOOKBACK + 1):]
        tail = {d: tail[d] for d in keep}
    state.update(
        (sorted(tail), [tail[d] for d in sorted(tail)], last_emitted)
    )
    yield pd.DataFrame(out, columns=["event_type", "day", "cents", "is_anomaly"])


def streaming_rolling_anomaly(stream: DataFrame) -> DataFrame:
    """Trailing-window anomaly flags as an ``applyInPandasWithState``
    stream: same integer-exact 2-sigma contract as the batch query, one
    bounded (day, cents) tail per event type in the state store."""
    return stream.groupBy("event_type").applyInPandasWithState(
        _update_rolling_anomaly,
        outputStructType=ROLLANOM_SCHEMA,
        stateStructType=_ROLLANOM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- transformWithStateInPandas (Spark 4 stateful API) -----------------------

PEAK_SCHEMA = "user_id long, event_id long, value double"


def _load_stateful_processor():
    """The Spark 4 ``StatefulProcessor`` API — imported lazily so the
    module stays importable on older runtimes."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class PeakTracker(StatefulProcessor):
        """Per-user high-watermark tracker: emits a row ONLY when an
        event sets a new personal maximum ``value`` — the alerting
        primitive behind record-breaker / anomaly-first notification
        feeds. One ValueState scalar per user in the RocksDB store;
        emission is append-mode and exactly-once across restarts
        (the high watermark survives in the state store, so a replayed
        batch re-derives identical outputs)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self.peak = handle.getValueState("peak", "value double")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            best = self.peak.get()[0] if self.peak.exists() else None
            out_ids, out_vals = [], []
            # concat-then-sort: event-time order holds per batch, not per
            # Arrow chunk (same contract as _update_markov)
            chunks = [pdf for pdf in rows if len(pdf)]
            if chunks:
                pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
                for eid, val in zip(pdf["event_id"], pdf["value"]):
                    if best is None or val > best:
                        best = float(val)
                        out_ids.append(int(eid))
                        out_vals.append(best)
            self.peak.update((best,))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out_ids),
                    "event_id": out_ids,
                    "value": out_vals,
                }
            ).astype({"user_id": "int64", "event_id": "int64", "value": "float64"})

        def close(self) -> None:
            pass

    return PeakTracker


_PEAK_STATE_SCHEMA = "best double"


def _update_peak(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """``applyInPandasWithState`` twin of the transformWithState
    PeakTracker: identical emissions (rows that set a new per-user
    maximum), identical restart semantics (the watermark scalar lives in
    the HDFS/RocksDB state store either way)."""
    best = state.get[0] if state.exists else None
    out_ids, out_vals = [], []
    chunks = [pdf for pdf in batches if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
        for eid, val in zip(pdf["event_id"], pdf["value"]):
            if best is None or val > best:
                best = float(val)
                out_ids.append(int(eid))
                out_vals.append(best)
    state.update((best,))
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(out_ids),
            "event_id": out_ids,
            "value": out_vals,
        }
    ).astype({"user_id": "int64", "event_id": "int64", "value": "float64"})


def transform_with_state_available() -> bool:
    """``transformWithStateInPandas`` speaks protobuf to the JVM state
    server; without ``google.protobuf`` the Python worker cannot start.
    Probed once so callers can dispatch rather than crash mid-stream."""
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def streaming_peak_tracker(stream: DataFrame, api: str = "auto") -> DataFrame:
    """Per-user record-breaker feed — emits a row only when an event sets
    a new personal maximum ``value``.

    Two equivalent engines, dispatched at plan time:

    - ``transform_with_state``: the Spark 4 ``transformWithStateInPandas``
      API (typed ValueState, RocksDB provider required in the caller's
      session config). Needs a working ``google.protobuf`` for the
      state-server wire protocol.
    - ``apply_in_pandas``: ``applyInPandasWithState`` with a one-scalar
      tuple state — byte-identical emissions and the same exactly-once
      restart story, with no protobuf dependency.

    ``api="auto"`` picks transformWithState when protobuf imports and
    falls back otherwise, so the operator runs (and is tested) in every
    environment instead of silently skipping where protobuf is absent."""
    if api == "auto":
        api = (
            "transform_with_state"
            if transform_with_state_available()
            else "apply_in_pandas"
        )
    if api == "transform_with_state":
        PeakTracker = _load_stateful_processor()
        return stream.groupBy("user_id").transformWithStateInPandas(
            PeakTracker(),
            outputStructType=PEAK_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    if api == "apply_in_pandas":
        return stream.groupBy("user_id").applyInPandasWithState(
            _update_peak,
            outputStructType=PEAK_SCHEMA,
            stateStructType=_PEAK_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    raise ValueError(f"unknown peak-tracker api: {api!r}")


# -- streaming CUSUM changepoint ---------------------------------------------

CP_SCHEMA = "cp_day string, n_days long, total_events long, cusum_abs long"
_CP_STATE_SCHEMA = "days array<string>, ns array<long>"


def _update_changepoint(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Online CUSUM changepoint: state is the (day -> count) rollup —
    bounded by distinct days, never events — and each microbatch emits
    the CURRENT argmax of |D*cum_d - rank_d*total| under the exact
    integer rule of the batch ``x_events_changepoint``, so the final
    emission converges to the batch answer once the stream drains."""
    days_counts: dict[str, int] = {}
    if state.exists:
        days0, ns0 = state.get
        days_counts = dict(zip(days0, (int(n) for n in ns0)))
    for pdf in batches:
        if not len(pdf):
            continue
        days = pd.to_datetime(pdf["ts"]).dt.strftime("%Y-%m-%d")
        for d, n in days.value_counts().items():
            days_counts[d] = days_counts.get(d, 0) + int(n)
    days_sorted = sorted(days_counts)
    total = sum(days_counts.values())
    n_days = len(days_sorted)
    cum = 0
    best_day, best_s = None, -1
    for rk, d in enumerate(days_sorted, start=1):
        cum += days_counts[d]
        s = abs(n_days * cum - rk * total)
        if s > best_s:  # strict: ties keep the EARLIEST day, as in batch
            best_day, best_s = d, s
    state.update((days_sorted, [days_counts[d] for d in days_sorted]))
    yield pd.DataFrame(
        {
            "cp_day": [best_day],
            "n_days": [n_days],
            "total_events": [total],
            "cusum_abs": [best_s],
        }
    ).astype(
        {
            "cp_day": "object",
            "n_days": "int64",
            "total_events": "int64",
            "cusum_abs": "int64",
        }
    )


def streaming_changepoint(stream: DataFrame) -> DataFrame:
    """Streaming twin of ``operators.temporal.q_events_changepoint``.

    One constant-key state holds the day rollup (at scale, a
    watermarked per-day pre-aggregation upstream shrinks the stateful
    input to one row per (day, microbatch); the state itself is already
    rollup-sized either way). Append mode: one current-answer row per
    microbatch; the last row equals the batch query's output."""
    return (
        stream.withColumn("g", F.lit(0))
        .groupBy("g")
        .applyInPandasWithState(
            _update_changepoint,
            outputStructType=CP_SCHEMA,
            stateStructType=_CP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# -- streaming Kendall tau-b -------------------------------------------------

KT_SCHEMA = "n_days long, nc long, nd long, n1 long, n2 long, tau_q long"
_KT_STATE_SCHEMA = "days array<string>, xs array<long>, ys array<long>"


def _update_kendall(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Online Kendall tau-b between daily event count and daily summed
    value: state is the (day -> (count, value_cents)) rollup — bounded
    by distinct days — and each microbatch emits the CURRENT exact
    concordant/discordant/tie counts (the O(days^2) pair pass runs over
    the rollup, never over events). tau is emitted quantized at 1e6
    (integer) so restarts and engines agree bit-for-bit."""
    days: dict[str, list[int]] = {}
    if state.exists:
        ds, xs, ys = state.get
        days = {d: [int(x), int(y)] for d, x, y in zip(ds, xs, ys)}
    for pdf in batches:
        if not len(pdf):
            continue
        day = pd.to_datetime(pdf["ts"]).dt.strftime("%Y-%m-%d")
        # HALF_UP (away from zero), matching the batch rule's Spark
        # F.round / DuckDB round — pandas .round() is half-to-even and
        # would diverge from the batch answer on half-cent values
        v = pdf["value"].to_numpy() * 100
        cents = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype("int64")
        for d, n, c in zip(day, [1] * len(pdf), cents):
            cur = days.setdefault(d, [0, 0])
            cur[0] += n
            cur[1] += int(c)
    ds = sorted(days)
    pts = [days[d] for d in ds]
    n_days = len(pts)
    nc = nd = n1 = n2 = 0
    for i in range(n_days):
        xi, yi = pts[i]
        for j in range(i + 1, n_days):
            xj, yj = pts[j]
            if (xi < xj and yi < yj) or (xi > xj and yi > yj):
                nc += 1
            elif (xi < xj and yi > yj) or (xi > xj and yi < yj):
                nd += 1
            if xi == xj:
                n1 += 1
            if yi == yj:
                n2 += 1
    n0 = n_days * (n_days - 1) // 2
    denom = (n0 - n1) * (n0 - n2)
    tau_q = (
        round(1_000_000 * (nc - nd) / (denom ** 0.5)) if denom > 0 else 0
    )
    state.update(
        (ds, [days[d][0] for d in ds], [days[d][1] for d in ds])
    )
    yield pd.DataFrame(
        {
            "n_days": [n_days],
            "nc": [nc],
            "nd": [nd],
            "n1": [n1],
            "n2": [n2],
            "tau_q": [int(tau_q)],
        }
    ).astype("int64")


def streaming_kendall(stream: DataFrame) -> DataFrame:
    """Streaming twin of ``operators.stats.stats_kendall_tau`` over the
    event stream: one constant-key state holds the day rollup (at scale
    a watermarked per-day pre-aggregation upstream shrinks the stateful
    input to one row per (day, microbatch); the state itself is already
    rollup-sized). Append mode: one current-answer row per microbatch;
    the final row matches the batch pair-pass integer rule."""
    return (
        stream.withColumn("g", F.lit(0))
        .groupBy("g")
        .applyInPandasWithState(
            _update_kendall,
            outputStructType=KT_SCHEMA,
            stateStructType=_KT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
