"""Temporal join operators: as-of join, range join, moving windows.

The reference's only temporal semantic is the latest-version pointer
(SURVEY §2.3 J6); these generalize it to the operators a time-aware
warehouse needs. Spark has no ASOF JOIN primitive — the as-of here is the
scalable composition: UNION both sides tagged, one shuffle on the key,
and a running-max window picks "latest left row at-or-before each right
row". Cost is one shuffle + one sort over rows(L)+rows(R) — versus a
per-row correlated probe (the naive form) that at 100 TB is a
nested-loop disaster. Range joins against a small band dimension
broadcast; Catalyst turns BETWEEN into a nested-loop over the broadcast
side, which is the right plan when the dim is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from geostore_spark.registry import register
from geostore_spark.sources.tables import load_table
from geostore_spark.operators.util import pin_branch_point, quantize


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    value_col: str,
) -> DataFrame:
    """For each right row, the max ``value_col`` among left rows with the
    same key and ``left_ts <= right_ts`` (as-of semantics via union +
    running-max window; one shuffle, no correlated probes)."""
    l_part = left.select(
        F.col(left_key).alias("k"),
        F.col(left_ts).cast("timestamp").alias("t"),
        F.lit(0).alias("is_probe"),
        F.lit(None).cast("long").alias("probe_id"),
        F.col(value_col).alias("v"),
    )
    r_part = right.select(
        F.col(right_key).alias("k"),
        F.col(right_ts).cast("timestamp").alias("t"),
        F.lit(1).alias("is_probe"),
        F.col("event_id").alias("probe_id"),
        F.lit(None).cast(dict(left.dtypes)[value_col]).alias("v"),
    )
    # build rows sort before probe rows at equal t → '<=' semantics
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_probe")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        l_part.unionByName(r_part)
        .withColumn("asof_v", F.max("v").over(w))
        .filter(F.col("is_probe") == 1)
        .select("probe_id", "k", "t", "asof_v")
    )


@register(
    "x_asof_join",
    "As-of join: each event picks the latest order date of its user at or "
    "before the event time. Union + running-max window — one shuffle on "
    "the key, no correlated per-row probes.",
    """SELECT e.event_id,
              (SELECT MAX(o.o_orderdate) FROM orders o
                WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
                AS last_order_ts
       FROM events e
       ORDER BY e.event_id LIMIT 200""",
)
def q_asof(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, "orders", sf)
    events = load_table(spark, "events", sf)
    return (
        asof_join(
            orders, events, "o_custkey", "user_id", "o_orderdate", "ts", "o_orderdate"
        )
        .select(F.col("probe_id").alias("event_id"), F.col("asof_v").alias("last_order_ts"))
        .orderBy("event_id")
        .limit(200)
    )


PRICE_BANDS: list[tuple[float, float, str]] = [
    (0.0, 25_000.0, "low"),
    (25_000.0, 100_000.0, "mid"),
    (100_000.0, 1_000_000.0, "high"),
]


def _bands_sql() -> str:
    rows = ", ".join(f"({lo}, {hi}, '{name}')" for lo, hi, name in PRICE_BANDS)
    return f"(VALUES {rows}) AS bands(lo, hi, band)"


@register(
    "x_range_join",
    "Range (interval) join: orders bucketed into literal price bands via "
    "BETWEEN against a broadcast dimension — nested-loop over the tiny "
    "broadcast side, never a shuffle of the fact table.",
    f"""SELECT bands.band, COUNT(*) AS n, ROUND(AVG(o.o_totalprice), 4) AS avg_price
       FROM orders o JOIN {_bands_sql()}
         ON o.o_totalprice >= bands.lo AND o.o_totalprice < bands.hi
       GROUP BY bands.band ORDER BY bands.band""",
)
def q_range_join(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, "orders", sf)
    # VALUES literal, not createDataFrame: a LocalRelation broadcasts without
    # the Python-RDD serialization job (measured 6.1s → 1.1s cold, 2× warm)
    rows = ", ".join(f"({lo}D, {hi}D, '{name}')" for lo, hi, name in PRICE_BANDS)
    bands = spark.sql(f"SELECT * FROM (VALUES {rows}) AS t(lo, hi, band)")
    return (
        orders.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
        .orderBy("band")
    )


@register(
    "x_win_moving_avg",
    "Moving average over an ordered per-key frame (ROWS BETWEEN 2 "
    "PRECEDING AND CURRENT ROW) — the rolling-metric window shape.",
    """SELECT o_custkey, o_orderkey,
              ROUND(AVG(o_totalprice) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS avg3
       FROM orders
       ORDER BY o_custkey, o_orderkey LIMIT 200""",
)
def q_moving_avg(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        load_table(spark, "orders", sf)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.avg("o_totalprice").over(w), 4).alias("avg3"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(200)
    )


# -- exponentially weighted moving average -----------------------------------

EWMA_WINDOW_DAYS = 13  # lookback: weights 2^0 .. 2^-13 (half-life = 1 day)


@register(
    "x_events_ewma",
    "Per-user EWMA of daily event volume (half-life one day, bounded "
    "14-day lookback) — the smoothed activity signal behind rate "
    "limiting and engagement scoring. One shuffle to (user, day) "
    "counts, then a RANGE-framed window per user collects the ≤14 "
    "in-window days and a higher-order aggregate folds them with "
    "exact power-of-two weights (every term and partial sum is an "
    "integer < 2^53, where double arithmetic is exact): numerator and "
    "denominator are exact, the single division deterministic. Window "
    "state is bounded "
    "by the lookback (14 structs), not the user's history, and "
    "parallelism is ∝ distinct users — no self-join (the oracle's "
    "quadratic form) ever runs on the Spark side.",
    f"""WITH d AS (
         SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS x
         FROM events GROUP BY user_id, day
       ),
       dd AS (
         SELECT user_id, day,
                date_diff('day', DATE '1970-01-01', day) AS dn, x
         FROM d
       )
       SELECT a.user_id, CAST(a.day AS VARCHAR) AS day, a.x AS n_events,
              CAST(SUM(b.x * (CAST(1 AS BIGINT)
                     << ({EWMA_WINDOW_DAYS} - (a.dn - b.dn)))) AS DOUBLE)
                / SUM(CAST(1 AS BIGINT)
                     << ({EWMA_WINDOW_DAYS} - (a.dn - b.dn))) AS ewma
       FROM dd a JOIN dd b
         ON a.user_id = b.user_id
        AND b.dn BETWEEN a.dn - {EWMA_WINDOW_DAYS} AND a.dn
       GROUP BY a.user_id, a.day, a.x
       ORDER BY a.user_id, a.day""",
)
def q_events_ewma(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, "events", sf)
    daily = (
        ev.select("user_id", F.to_date("ts").alias("day"))
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).alias("x"))
        .withColumn("dn", F.datediff("day", F.lit("1970-01-01")).cast("long"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("dn")
        .rangeBetween(-EWMA_WINDOW_DAYS, 0)
    )
    hist = F.collect_list(F.struct("dn", "x")).over(w)
    # fold the ≤14-struct window via EXPLODE + re-aggregate instead of a
    # higher-order F.aggregate lambda: transform/aggregate lambdas are
    # interpreted (CodegenFallback), and the explode keeps the whole
    # weighted fold inside whole-stage codegen (r10 measured sf1:
    # 3.1 → 2.6 s, identical values). 2^(13-(dn_cur-dn_j)) via pow:
    # every term and partial sum is an integer < 2^53, where IEEE
    # double arithmetic is EXACT — bit-equal to the oracle's BIGINT
    # shifts; the re-aggregate groups on the (user, day) grain the
    # window row already carried, so weights never mix across rows.
    e = daily.select(
        "user_id", "day", F.col("x").alias("n_events"), "dn",
        hist.alias("hist"),
    ).select(
        "user_id", "day", "n_events", "dn", F.explode("hist").alias("h")
    )
    wgt = F.pow(
        F.lit(2.0), F.lit(EWMA_WINDOW_DAYS) - (F.col("dn") - F.col("h.dn"))
    )
    return (
        e.groupBy("user_id", "day", "n_events")
        .agg((F.sum(F.col("h.x") * wgt) / F.sum(wgt)).alias("ewma"))
        .orderBy("user_id", "day")
    )


# -- event-sequence transition matrix ----------------------------------------


@register(
    "x_events_markov",
    "First-order Markov transition matrix over per-user event "
    "sequences — the sequence-model prior (and funnel generalization: "
    "every A→B conversion rate at once). One user_id-keyed shuffle "
    "feeds a LAG window ordered by (ts, event_id); transition counts "
    "partially aggregate on the ≤25 (prev, next) keys; row "
    "normalization derives from the transition table itself (tiny "
    "re-aggregation, broadcast back) — the event stream is read and "
    "shuffled exactly once. Probabilities are single divisions of "
    "exact counts.",
    """WITH seq AS (
         SELECT user_id, event_type,
                LAG(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS prev
         FROM events
       ),
       t AS (
         SELECT prev, event_type AS next, COUNT(*) AS n
         FROM seq WHERE prev IS NOT NULL GROUP BY prev, next
       ),
       m AS (SELECT prev, CAST(SUM(n) AS BIGINT) AS n_prev FROM t GROUP BY prev)
       SELECT t.prev, t.next, t.n,
              CAST(t.n AS DOUBLE) / m.n_prev AS p
       FROM t JOIN m ON t.prev = m.prev
       ORDER BY t.prev, t.next""",
)
def q_events_markov(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, "events", sf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev"),
    )
    t = (
        seq.filter(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("next"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = t.transform(pin_branch_point)
    m = t.groupBy("prev").agg(F.sum("n").cast("bigint").alias("n_prev"))
    return (
        t.join(F.broadcast(m), "prev")
        .select("prev", "next", "n", (F.col("n").cast("double") / F.col("n_prev")).alias("p"))
        .orderBy("prev", "next")
    )


# -- calendar gap-fill + forward-fill ----------------------------------------

GAPFILL_USERS = 20  # bounded demo slice; the shape is per-user at any scale


@register(
    "x_events_gapfill",
    "Calendar gap-filling with forward-fill — the time-series "
    "regularization every downstream window/EWMA expects (a user with "
    "no events on a day must contribute an explicit row, carrying the "
    "last observed daily value). The day spine is a per-user "
    "sequence()/explode between that user's own first and last day — "
    "generated inside the scan stage, no calendar dimension join; the "
    "fill is one LAST_VALUE IGNORE NULLS window per user. Output "
    "marks which rows are observed vs filled; all values exact "
    "integers.",
    f"""WITH d AS (
         SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS x
         FROM events WHERE user_id < {GAPFILL_USERS}
         GROUP BY user_id, day
       ),
       bounds AS (
         SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM d GROUP BY user_id
       ),
       spine AS (
         SELECT b.user_id, CAST(u.day AS DATE) AS day
         FROM bounds b, UNNEST(generate_series(b.d0, b.d1, INTERVAL 1 DAY))
           AS u(day)
       )
       SELECT s.user_id, CAST(s.day AS VARCHAR) AS day,
              d.x IS NOT NULL AS observed,
              COALESCE(d.x,
                LAST_VALUE(d.x IGNORE NULLS) OVER (
                  PARTITION BY s.user_id ORDER BY s.day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                AS x_filled
       FROM spine s LEFT JOIN d ON s.user_id = d.user_id AND s.day = d.day
       ORDER BY s.user_id, s.day""",
)
def q_events_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, "events", sf).filter(F.col("user_id") < GAPFILL_USERS)
    d = (
        ev.select("user_id", F.to_date("ts").alias("day"))
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    d = d.transform(pin_branch_point)
    spine = (
        d.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1")).alias("day"),
        )
    )
    j = spine.join(d, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        j.select(
            "user_id",
            F.col("day").cast("string").alias("day"),
            F.col("x").isNotNull().alias("observed"),
            F.coalesce("x", F.last("x", ignorenulls=True).over(w)).alias("x_filled"),
        )
        .orderBy("user_id", "day")
    )


# -- inter-order survival / churn --------------------------------------------

SURVIVAL_DAYS = (30, 90, 180, 365)


@register(
    "x_orders_survival",
    "Inter-purchase survival curve: the distribution of gaps between "
    "a customer's consecutive orders, summarized as P(next order "
    "within d) for d in {30, 90, 180, 365} — the churn-model baseline "
    "(a customer whose current silence exceeds the observed p90 gap "
    "is at risk). One customer-keyed LAG window produces the gaps; "
    "the survival points are exact count ratios from one global "
    "aggregate.",
    f"""WITH g AS (
         SELECT o_custkey,
                date_diff('day',
                          LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                                 ORDER BY o_orderdate,
                                                          o_orderkey),
                          o_orderdate) AS gap_days
         FROM orders
       ),
       gg AS (SELECT gap_days FROM g WHERE gap_days IS NOT NULL)
       SELECT COUNT(*) AS n_gaps,
              CAST(MIN(gap_days) AS BIGINT) AS min_gap,
              CAST(MAX(gap_days) AS BIGINT) AS max_gap,
              {", ".join(
                  f'''CAST(SUM(CASE WHEN gap_days <= {d} THEN 1 ELSE 0 END)
                       AS DOUBLE) / COUNT(*) AS p_within_{d}d'''
                  for d in SURVIVAL_DAYS
              )}
       FROM gg""",
)
def q_orders_survival(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, "orders", sf)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = orders.select(
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))
        ).alias("gap_days")
    ).filter(F.col("gap_days").isNotNull())
    aggs = [
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_days").cast("bigint").alias("min_gap"),
        F.max("gap_days").cast("bigint").alias("max_gap"),
    ]
    aggs += [
        (
            F.sum((F.col("gap_days") <= d).cast("bigint")).cast("double")
            / F.count(F.lit(1))
        ).alias(f"p_within_{d}d")
        for d in SURVIVAL_DAYS
    ]
    return g.agg(*aggs)


# -- period-over-period change -----------------------------------------------


@register(
    "x_win_pct_change",
    "Month-over-month revenue change per order priority — the "
    "period-over-period delta every finance/growth dashboard leads "
    "with. One shuffle to (priority, month) exact-cent sums, a LAG "
    "window over the ≤90-row monthly rollup (window input is "
    "aggregate-sized, not fact-sized — the right decomposition at any "
    "scale), and the percent change is one division of exact "
    "integers.",
    """WITH m AS (
         SELECT o_orderpriority AS prio,
                CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS month,
                CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS cents
         FROM orders GROUP BY prio, month
       ),
       l AS (
         SELECT prio, month, cents,
                LAG(cents) OVER (PARTITION BY prio ORDER BY month) AS prev
         FROM m
       )
       SELECT prio, month, cents,
              CAST(prev AS BIGINT) AS prev_cents,
              (CAST(cents AS DOUBLE) - prev) / prev AS pct_change
       FROM l WHERE prev IS NOT NULL
       ORDER BY prio, month LIMIT 300""",
)
def q_pct_change(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, "orders", sf)
    m = orders.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    ).agg(
        F.sum(quantize(F.col("o_totalprice"), 100))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.partitionBy("prio").orderBy("month")
    l_ = m.withColumn("prev", F.lag("cents").over(w)).filter(
        F.col("prev").isNotNull()
    )
    return (
        l_.select(
            "prio",
            "month",
            "cents",
            F.col("prev").cast("bigint").alias("prev_cents"),
            ((F.col("cents").cast("double") - F.col("prev")) / F.col("prev")).alias(
                "pct_change"
            ),
        )
        .orderBy("prio", "month")
        .limit(300)
    )


# -- Markov entropy rate -----------------------------------------------------


@register(
    "x_events_entropy_rate",
    "Entropy rate of the event-sequence Markov chain — how predictable "
    "the next event is given the current one (ln 5 ≈ 1.61 = pure "
    "noise; 0 = deterministic flows). Complements x_events_markov: "
    "the same one-LAG-window transition counts reduce to "
    "H = -Σ p(prev,next) ln p(next|prev), every term a quantized "
    "function of exact integer counts summed in integer space.",
    """WITH seq AS (
         SELECT user_id, event_type,
                LAG(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS prev
         FROM events
       ),
       t AS (
         SELECT prev, event_type AS next, COUNT(*) AS n
         FROM seq WHERE prev IS NOT NULL GROUP BY prev, next
       ),
       m AS (SELECT prev, CAST(SUM(n) AS BIGINT) AS n_prev FROM t GROUP BY prev),
       tot AS (SELECT CAST(SUM(n) AS BIGINT) AS z FROM t),
       q AS (
         SELECT CAST(round(-(CAST(t.n AS DOUBLE) / tot.z)
                           * ln(CAST(t.n AS DOUBLE) / m.n_prev)
                           * 1000000000) AS BIGINT) AS h_q
         FROM t JOIN m ON t.prev = m.prev CROSS JOIN tot
       )
       SELECT COUNT(*) AS n_transitions,
              CAST(SUM(h_q) AS DOUBLE) / 1000000000 AS entropy_rate_nats
       FROM q""",
)
def q_entropy_rate(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, "events", sf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    # The transition matrix is type-bounded (|event_type|² cells), so
    # after the one (prev, next) shuffle it coalesces to a single
    # partition and the row marginal + grand total become window sums —
    # no checkpoint pin, no broadcast branches (r11 lever, same as
    # chi2/mutual_info)
    t = (
        seq.groupBy("prev", F.col("event_type").alias("next"))
        .agg(F.count(F.lit(1)).alias("n"))
        .coalesce(1)
    )
    t = t.withColumn(
        "n_prev", F.sum("n").over(Window.partitionBy("prev")).cast("bigint")
    ).withColumn("z", F.sum("n").over(Window.partitionBy()).cast("bigint"))
    h_q = F.round(
        -(F.col("n").cast("double") / F.col("z"))
        * F.log(F.col("n").cast("double") / F.col("n_prev"))
        * 1_000_000_000,
        0,
    ).cast("bigint")
    return (
        t.select(h_q.alias("h_q"))
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            (F.sum("h_q").cast("double") / 1_000_000_000).alias(
                "entropy_rate_nats"
            ),
        )
    )


# -- rolling robust anomaly flags --------------------------------------------

ANOM_LOOKBACK = 7  # trailing days (current day excluded)


@register(
    "x_events_rolling_anomaly",
    "Trailing-window anomaly flags on daily revenue per event type: a "
    "day is anomalous when its total deviates from the preceding "
    f"{ANOM_LOOKBACK}-day mean by more than 2 trailing population "
    "sigmas. All arithmetic is integer-exact: values quantize to "
    "cents, and the 2-sigma test cross-multiplies to "
    "(n*v - sum)^2 > 4*(n*sumsq - sum^2) so no float mean/variance "
    "ever forms (bounds: daily cents < 2^27, 7-day sumsq < 2^56 — all "
    "inside int64). One shuffle to (type, day), one ROWS-framed window "
    "per type ordered by day; window state is the 7-row frame, "
    "parallelism ∝ distinct types at toy SF and ∝ (type, day-range) "
    "buckets with a two-phase frame split at scale.",
    f"""WITH d AS (
         SELECT event_type, CAST(ts AS DATE) AS day,
                CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents
         FROM events GROUP BY event_type, day
       ),
       w AS (
         SELECT event_type, day, cents,
                COUNT(*) OVER tw AS n,
                SUM(cents) OVER tw AS s,
                SUM(cents * cents) OVER tw AS ss
         FROM d
         WINDOW tw AS (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN {ANOM_LOOKBACK} PRECEDING AND 1 PRECEDING)
       )
       SELECT event_type, CAST(day AS VARCHAR) AS day, cents,
              (n = {ANOM_LOOKBACK} AND
               (n * cents - s) * (n * cents - s) > 4 * (n * ss - s * s))
                AS is_anomaly
       FROM w ORDER BY event_type, day""",
)
def q_rolling_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, "events", sf)
    d = (
        ev.groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        ).agg(
            F.sum(F.floor(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    tw = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-ANOM_LOOKBACK, -1)
    )
    w = d.select(
        "event_type",
        "day",
        "cents",
        F.count(F.lit(1)).over(tw).alias("n"),
        F.sum("cents").over(tw).alias("s"),
        F.sum(F.col("cents") * F.col("cents")).over(tw).alias("ss"),
    )
    lhs = (F.col("n") * F.col("cents") - F.col("s"))
    anom = (F.col("n") == ANOM_LOOKBACK) & (
        lhs * lhs > 4 * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
    )
    return w.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        "cents",
        anom.alias("is_anomaly"),
    ).orderBy("event_type", "day")


# -- burstiness (Fano factor) -------------------------------------------------


@register(
    "x_events_burstiness",
    "Burstiness screen per event type: the Fano factor (variance/mean) "
    "of daily event counts — ~1 for Poisson-like arrivals, >>1 for "
    "bursty/bot traffic. Integer-exact end to end: with n days, "
    "s = sum of counts, ss = sum of squares, the population "
    "variance/mean ratio quantizes as ((n*ss - s*s) * 1e6) // (n*s) — "
    "no float moments ever form. Two partially-aggregated shuffles "
    "(daily counts, then the per-type 3-scalar rollup).",
    """WITH d AS (
         SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
         FROM events GROUP BY event_type, day
       ),
       m AS (
         SELECT event_type, COUNT(*) AS n_days,
                CAST(SUM(c) AS BIGINT) AS s,
                CAST(SUM(c * c) AS BIGINT) AS ss
         FROM d GROUP BY event_type
       )
       SELECT event_type, n_days, s AS n_events,
              CAST(((n_days * ss - s * s) * 1000000) // (n_days * s)
                   AS BIGINT) AS fano_q6
       FROM m ORDER BY event_type""",
)
def q_events_burstiness(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, "events", sf)
    d = ev.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    m = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ss"),
    )
    return m.select(
        "event_type",
        "n_days",
        F.col("s").alias("n_events"),
        F.expr("(n_days * ss - s * s) * 1000000 div (n_days * s)")
        .cast("bigint")
        .alias("fano_q6"),
    ).orderBy("event_type")


# -- weekday seasonality -------------------------------------------------------


@register(
    "x_events_seasonality",
    "Weekday seasonality profile per event type: counts by day-of-week "
    "plus each weekday's relative deviation from the uniform share — "
    "the weekly-rhythm screen behind traffic forecasting and anomaly "
    "baselines. Day-of-week derives from epoch-day mod 7 (identical "
    "integer arithmetic in both engines — named dow functions disagree "
    "on week start), and deviations quantize via integer "
    "cross-multiplication (((7*n - s) * 1e6) // s). One fact shuffle "
    "to (type, dow) cells; per-type totals re-aggregate the cell table "
    "and broadcast back.",
    """WITH c AS (
         SELECT event_type,
                CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
                     AS INT) AS dow,
                COUNT(*) AS n
         FROM events GROUP BY event_type, dow
       ),
       t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS s FROM c GROUP BY event_type)
       SELECT c.event_type, c.dow, CAST(c.n AS BIGINT) AS n,
              CAST(((7 * c.n - t.s) * 1000000) // t.s AS BIGINT) AS dev_q6
       FROM c JOIN t ON c.event_type = t.event_type
       ORDER BY c.event_type, dow""",
)
def q_events_seasonality(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, "events", sf)
    c = ev.select(
        "event_type",
        (F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")) % 7)
        .cast("int")
        .alias("dow"),
    ).groupBy("event_type", "dow").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("event_type").agg(F.sum("n").cast("bigint").alias("s"))
    return (
        c.join(F.broadcast(t), "event_type")
        .select(
            "event_type",
            "dow",
            F.col("n").cast("bigint").alias("n"),
            F.expr("(7 * n - s) * 1000000 div s").cast("bigint").alias("dev_q6"),
        )
        .orderBy("event_type", "dow")
    )


# -- CUSUM changepoint on the daily event series -----------------------------


@register(
    "x_events_changepoint",
    "CUSUM changepoint detection on the daily event-count series: the "
    "day d maximizing |D*cum_d - rank_d*N| (the cumulative deviation "
    "from a flat rate, cross-multiplied so it is exact int64) is the "
    "single most likely level-shift point - the drift alarm a pipeline "
    "runs on its ingest volume before trusting a day's data. One "
    "shuffle collapses the fact stream to the ~30-row daily rollup; "
    "the cumulative window, the argmax and the tie-break (earliest "
    "day) all run on that rollup, so the plan is rollup-sized above "
    "the first aggregate at any SF.",
    """WITH d AS (
         SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
         FROM events GROUP BY day
       ),
       c AS (
         SELECT day, n,
                CAST(SUM(n) OVER (ORDER BY day) AS BIGINT) AS cum,
                CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS rk,
                CAST(COUNT(*) OVER () AS BIGINT) AS n_days,
                CAST(SUM(n) OVER () AS BIGINT) AS total
         FROM d
       )
       SELECT CAST(day AS VARCHAR) AS cp_day, CAST(n_days AS BIGINT) AS n_days,
              CAST(total AS BIGINT) AS total_events,
              CAST(abs(n_days * cum - rk * total) AS BIGINT) AS cusum_abs
       FROM c
       ORDER BY abs(n_days * cum - rk * total) DESC, day ASC
       LIMIT 1""",
)
def q_events_changepoint(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, "events", sf)
    d = (
        ev.select(F.col("ts").cast("date").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy("day")
    wall = Window.partitionBy()
    c = d.select(
        "day",
        F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.row_number().over(w).cast("bigint").alias("rk"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n_days"),
        F.sum("n").over(wall).cast("bigint").alias("total"),
    )
    s = F.abs(F.col("n_days") * F.col("cum") - F.col("rk") * F.col("total"))
    return (
        c.select(
            F.col("day").cast("string").alias("cp_day"),
            "n_days",
            F.col("total").alias("total_events"),
            s.cast("bigint").alias("cusum_abs"),
        )
        .orderBy(F.col("cusum_abs").desc(), "cp_day")
        .limit(1)
    )


# -- sweep-line interval aggregation ------------------------------------------


@register(
    "x_orders_active_intervals",
    "Active-interval count by day (sweep line): how many orders are in "
    "fulfillment — between order date and their last line's ship date, "
    "inclusive — on each day, plus the exact open order value in "
    "cents. THE interval-aggregation shape (hotel occupancy / "
    "concurrent sessions / open connections): never expand intervals "
    "into per-day rows (days x intervals blows up at 100 TB) — each "
    "order contributes +1 at its start and -1 the day after its end, "
    "the deltas partially aggregate into a day-bounded rollup (the "
    "interval build is ONE orderkey-rollup shuffle + one co-keyed "
    "join), and the running totals are the two-phase distributed "
    "prefix sum (range partition + broadcast slice offsets — never a "
    "1-task global window). Value sums are exact integer cents, so "
    "the cumulative is shuffle-order-independent. Output is the step "
    "function's BREAKPOINTS — one row per endpoint day, each count "
    "holding until the next row — trimmed to breakpoints with at "
    "least one open order.",
    """WITH iv AS (
         SELECT o.o_orderdate AS start_day,
                MAX(l.l_shipdate) AS end_day,
                CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
         FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         GROUP BY o.o_orderkey, o.o_orderdate, o.o_totalprice
       ),
       d AS (
         SELECT start_day AS day, 1 AS dn, cents AS dv FROM iv
         UNION ALL
         SELECT end_day + INTERVAL 1 DAY, -1, -cents FROM iv
       ),
       r AS (
         SELECT day, CAST(SUM(dn) AS BIGINT) AS dn,
                CAST(SUM(dv) AS BIGINT) AS dv
         FROM d GROUP BY day
       ),
       c AS (
         SELECT day,
                CAST(SUM(dn) OVER (ORDER BY day) AS BIGINT) AS n_open,
                CAST(SUM(dv) OVER (ORDER BY day) AS BIGINT)
                  AS open_value_cents
         FROM r
       )
       SELECT CAST(day AS DATE) AS day, n_open, open_value_cents
       FROM c WHERE n_open > 0 ORDER BY day""",
)
def q_orders_active_intervals(spark: SparkSession, sf: str) -> DataFrame:
    from geostore_spark.operators.util import distributed_prefix_sum

    orders = load_table(spark, "orders", sf).select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    li = load_table(spark, "lineitem", sf).select("l_orderkey", "l_shipdate")
    ends = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.max("l_shipdate").alias("end_day")
    )
    iv = orders.join(ends, "o_orderkey").select(
        F.col("o_orderdate").alias("start_day"),
        "end_day",
        quantize(F.col("o_totalprice"), 100).alias("cents"),
    )
    # one generator pass emits both endpoint deltas inside the join
    # stage (a UNION of two selects would run the join twice)
    deltas = iv.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("start_day").alias("day"),
                    F.lit(1).alias("dn"),
                    F.col("cents").alias("dv"),
                ),
                F.struct(
                    F.date_add(F.col("end_day"), 1).alias("day"),
                    F.lit(-1).alias("dn"),
                    (-F.col("cents")).alias("dv"),
                ),
            )
        ).alias("e")
    ).select("e.day", "e.dn", "e.dv")
    r = deltas.groupBy("day").agg(
        F.sum("dn").cast("bigint").alias("dn"),
        F.sum("dv").cast("bigint").alias("dv"),
    )
    # both cumulatives ride ONE range partitioning / window / offset
    # join (the helper's multi-column form)
    from geostore_spark.operators.dedup import _count_rows_cheap

    c = distributed_prefix_sum(
        r, [], ["day"], "dn", out_name="n_open", also={"dv": "v_cum"},
        # day-level rows <= 2x orders rows (two deltas per interval):
        # a cheap metadata bound for the local-window dispatch
        row_count=2 * _count_rows_cheap(orders),
    )
    return (
        c.filter(F.col("n_open") > 0)
        .select(
            # midnight timestamp, not date: DuckDB's pandas bridge maps
            # DATE to datetime64, so the comparable shape is timestamp
            F.col("day").cast("timestamp").alias("day"),
            F.col("n_open").cast("bigint").alias("n_open"),
            F.col("v_cum").cast("bigint").alias("open_value_cents"),
        )
        .orderBy("day")
    )
