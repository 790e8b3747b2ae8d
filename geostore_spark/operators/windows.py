"""Event-time window operators over the ``events`` table.

Tumbling / sliding / session windows. The reference has no window
semantics (SURVEY §2.9: its streaming is orchestration); these are the
designated north-star extension surface. Implemented with Spark's native
``window()`` / ``session_window()`` so the *same* expressions run under
Structured Streaming with watermarks (geostore_spark/streaming/).

Oracle equivalents: tumbling = date_trunc; sliding = union of the two
covering window starts; session = gaps-and-islands (lag + running sum),
with session end = last event + gap, matching Spark's session_window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geostore_spark.registry import register
from geostore_spark.sources.tables import load_table
from geostore_spark.operators.util import pin_branch_point, quantize


@register(
    "x_win_tumbling",
    "Tumbling 1-day window aggregate per event_type (epoch-aligned, so "
    "window.start == date_trunc('day')).",
    """SELECT date_trunc('day', ts) AS w_start, event_type,
              COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_v
       FROM events GROUP BY w_start, event_type ORDER BY w_start, event_type""",
)
def win_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, "events", sf)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_v"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "sum_v")
        .orderBy("w_start", "event_type")
    )


@register(
    "x_win_sliding",
    "Sliding 2-day window, 1-day slide: every event lands in exactly two "
    "windows (starts at trunc(day) and trunc(day)-1d).",
    """WITH w AS (
         SELECT date_trunc('day', ts) AS w_start, value FROM events
         UNION ALL
         SELECT date_trunc('day', ts) - INTERVAL 1 DAY AS w_start, value FROM events
       )
       SELECT w_start, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_v
       FROM w GROUP BY w_start ORDER BY w_start""",
)
def win_sliding(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, "events", sf)
        .groupBy(F.window("ts", "2 days", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_v"))
        .select(F.col("w.start").alias("w_start"), "n", "sum_v")
        .orderBy("w_start")
    )


@register(
    "x_win_session",
    "Session windows per user with a 2-hour gap; session end = last event "
    "+ gap (Spark session_window semantics, reproduced in the oracle via "
    "gaps-and-islands).",
    """WITH o AS (
         SELECT user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                          OR ts >= lag(ts) OVER w + INTERVAL 2 HOUR
                     THEN 1 ELSE 0 END AS new_s
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       ),
       s AS (
         SELECT user_id, ts,
                SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
         FROM o
       )
       SELECT user_id, MIN(ts) AS s_start, MAX(ts) + INTERVAL 2 HOUR AS s_end,
              COUNT(*) AS n
       FROM s GROUP BY user_id, sid ORDER BY user_id, s_start LIMIT 200""",
)
def win_session(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, "events", sf)
        .groupBy(F.session_window("ts", "2 hours").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            "n",
        )
        .orderBy("user_id", "s_start")
        .limit(200)
    )


@register(
    "x_win_event_gap",
    "Inter-event gap analytics (LAG): per-user time between consecutive "
    "events, rolled up per event_type of the later event — the "
    "session-depth / engagement-cadence primitive. The window shuffles "
    "once on user_id (the natural ingest partition key at scale); gaps "
    "are exact integer microseconds so every aggregate is "
    "associative-exact, and the float mean divides two exact integers "
    "per group.",
    """WITH g AS (
         SELECT event_type,
                epoch_us(ts) - lag(epoch_us(ts)) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
         FROM events
       )
       SELECT event_type, COUNT(*) AS n_gaps,
              CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
              MAX(gap_us) AS max_gap_us,
              CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) / 1e6 AS avg_gap_s
       FROM g WHERE gap_us IS NOT NULL
       GROUP BY event_type ORDER BY event_type""",
)
def win_event_gap(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, "events", sf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    gaps = ev.select("event_type", gap.alias("gap_us")).filter(
        F.col("gap_us").isNotNull()
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap_us").alias("sum_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
        .withColumn(
            "avg_gap_s",
            F.col("sum_gap_us").cast("double") / F.col("n_gaps") / F.lit(1e6),
        )
        .orderBy("event_type")
    )


@register(
    "x_win_attribution",
    "Last-touch attribution: each purchase credits the most recent "
    "preceding click/view of the same user (conversion-path primitive). "
    "One running-MAX-over-CASE window — a single user_id shuffle, fully "
    "codegen'd, no self-join — then an exact-integer recency-bucket "
    "rollup. The naive per-purchase correlated lookup is a nested-loop "
    "disaster at 100 TB; the window form is the as-of-join trick "
    "applied within one table.",
    """WITH w AS (
         SELECT event_type,
                epoch_us(ts) AS ts_us,
                MAX(CASE WHEN event_type IN ('click', 'view')
                         THEN epoch_us(ts) END) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ) AS touch_us
         FROM events
       )
       SELECT CASE
                WHEN touch_us IS NULL THEN 'none'
                WHEN ts_us - touch_us <= 3600000000 THEN 'within_1h'
                WHEN ts_us - touch_us <= 86400000000 THEN 'within_1d'
                ELSE 'older'
              END AS touch_bucket,
              COUNT(*) AS purchases,
              CAST(SUM(CASE WHEN touch_us IS NOT NULL
                            THEN ts_us - touch_us ELSE 0 END) AS BIGINT)
                AS sum_latency_us
       FROM w WHERE event_type = 'purchase'
       GROUP BY touch_bucket ORDER BY touch_bucket""",
)
def win_attribution(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, "events", sf)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.max(
        F.when(
            F.col("event_type").isin("click", "view"), F.unix_micros(F.col("ts"))
        )
    ).over(w)
    lat = F.unix_micros(F.col("ts")) - F.col("touch_us")
    bucket = (
        F.when(F.col("touch_us").isNull(), F.lit("none"))
        .when(lat <= 3_600_000_000, F.lit("within_1h"))
        .when(lat <= 86_400_000_000, F.lit("within_1d"))
        .otherwise(F.lit("older"))
    )
    return (
        ev.select("event_type", "ts", "event_id", "user_id")
        .withColumn("touch_us", touch)
        .filter(F.col("event_type") == "purchase")
        .groupBy(bucket.alias("touch_bucket"))
        .agg(
            F.count(F.lit(1)).alias("purchases"),
            F.sum(
                F.when(F.col("touch_us").isNotNull(), lat).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("sum_latency_us"),
        )
        .orderBy("touch_bucket")
    )


@register(
    "x_win_ntile_quartiles",
    "NTILE quartile assignment per event_type with per-quartile exact "
    "value rollups — the rank-bucket windowing class (equal-count "
    "buckets, vs the equal-width x_stats_histogram). NTILE(4) is "
    "reconstructed from a two-phase distributed ROW_NUMBER plus the "
    "broadcast group size (util.distributed_row_number): with a handful "
    "of event types a plain global window is a types-count task ceiling "
    "holding whole types in memory; the two-phase form keeps "
    "parallelism proportional to data. Sums are exact decimals so "
    "partial aggregation stays associative-exact.",
    """WITH t AS (
         SELECT event_type, value,
                NTILE(4) OVER (PARTITION BY event_type
                               ORDER BY value, event_id) AS quartile
         FROM events
       )
       SELECT event_type, quartile, COUNT(*) AS n,
              ROUND(MIN(value), 4) AS min_v, ROUND(MAX(value), 4) AS max_v,
              ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                    / COUNT(*), 4) AS mean_v
       FROM t GROUP BY event_type, quartile
       ORDER BY event_type, quartile""",
)
def win_ntile_quartiles(spark: SparkSession, sf: str) -> DataFrame:
    from geostore_spark.operators.util import distributed_row_number

    ev = load_table(spark, "events", sf)
    from geostore_spark.operators.dedup import _count_rows_cheap

    ranked, group_n = distributed_row_number(
        ev.select("event_type", "value", "event_id"),
        ["event_type"],
        ["value", "event_id"],
        rn_name="i",
        row_count=_count_rows_cheap(ev),
    )
    # NTILE(k) from the global rank i and group size n: the first
    # n % k buckets hold floor(n/k)+1 rows, the rest floor(n/k).
    # integer-exact ceil(a/b) = (a-1) div b + 1 — double division would
    # misround at 2^53-scale ranks (k=4 quartiles)
    quartile = F.expr(
        """CAST(CASE WHEN i <= (_n % 4) * ((_n div 4) + 1)
                     THEN (i - 1) div ((_n div 4) + 1) + 1
                     ELSE (_n % 4)
                          + (i - (_n % 4) * ((_n div 4) + 1) - 1) div (_n div 4)
                          + 1
                END AS INT)"""
    )
    # The exact mean's decimal sum accumulates as cents BIGINTs (value
    # carries exactly 2 decimals, so CAST(value AS DECIMAL(28,6)) ==
    # cents/100) — plain long adds in codegen instead of a per-value
    # BigDecimal buffer (cov_matrix/gini lever); the decimal division
    # on the 20 group rows keeps the double cast a single rounding.
    return (
        ranked.join(F.broadcast(group_n), ["event_type"])
        .select(
            "event_type",
            "value",
            quartile.alias("quartile"),
            F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("c1"),
        )
        .groupBy("event_type", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 4).alias("min_v"),
            F.round(F.max("value"), 4).alias("max_v"),
            F.sum("c1").alias("sc1"),
        )
        .selectExpr(
            "event_type",
            "quartile",
            "n",
            "min_v",
            "max_v",
            "round(cast(cast(sc1 as decimal(38,0)) / 100 as double) / n, 4)"
            " as mean_v",
        )
        .orderBy("event_type", "quartile")
    )


@register(
    "x_win_dense_rank_topn",
    "DENSE_RANK top-N with ties per group — unlike row_number (W1), "
    "ties share a rank and ALL tied rows at a kept rank survive: the "
    "leaderboard semantics. One keyed window shuffle; the rank filter "
    "prunes before anything else moves.",
    """SELECT o_custkey, o_orderkey, o_totalprice, rnk
       FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                    DENSE_RANK() OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderstatus) AS rnk
             FROM orders)
       WHERE rnk <= 2 AND o_custkey <= 50
       ORDER BY o_custkey, rnk, o_orderkey""",
)
def win_dense_rank_topn(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, "orders", sf)
    w = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
    return (
        orders.withColumn("rnk", F.dense_rank().over(w))
        .filter((F.col("rnk") <= 2) & (F.col("o_custkey") <= 50))
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
        .orderBy("o_custkey", "rnk", "o_orderkey")
    )


@register(
    "x_win_cume_dist",
    "Distribution-position windows — percent_rank and cume_dist of "
    "customer balance within (nation, segment) cells: the per-cohort "
    "percentile position used for within-stratum normalization before "
    "cross-stratum comparison. 125 window partitions (25 nations x 5 "
    "segments) — parallelism ∝ cell count, an order of magnitude above "
    "the segment-only shape the two-phase rank helper exists for; both "
    "rank fractions are pure (rank-1)/(n-1)-style ratios of exact "
    "integers, deterministic across engines.",
    """SELECT c_nationkey, c_mktsegment, c_custkey,
              CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
              PERCENT_RANK() OVER w AS pct_rank,
              CUME_DIST() OVER w AS cume
       FROM customer
       WINDOW w AS (PARTITION BY c_nationkey, c_mktsegment
                    ORDER BY round(c_acctbal * 100), c_custkey)
       QUALIFY c_custkey <= 300
       ORDER BY c_nationkey, c_mktsegment, c_custkey""",
)
def win_cume_dist(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    cust = load_table(spark, "customer", sf)
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
    w = Window.partitionBy("c_nationkey", "c_mktsegment").orderBy(
        cents, "c_custkey"
    )
    return (
        cust.select(
            "c_nationkey",
            "c_mktsegment",
            "c_custkey",
            cents.alias("bal_cents"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .filter(F.col("c_custkey") <= 300)
        .orderBy("c_nationkey", "c_mktsegment", "c_custkey")
    )


@register(
    "x_win_first_last",
    "Frame-edge window functions — FIRST_VALUE / LAST_VALUE / "
    "NTH_VALUE over each customer's order history (full-partition "
    "frame): first order price, latest order price, second order "
    "price, and the latest-vs-first delta. The unbounded frame is "
    "evaluated once per partition (running-frame rewrite), one keyed "
    "window shuffle; prices compare as exact cents.",
    """SELECT o_custkey,
              COUNT(*) OVER w AS n_orders,
              FIRST_VALUE(cents) OVER w AS first_cents,
              LAST_VALUE(cents) OVER w AS last_cents,
              NTH_VALUE(cents, 2) OVER w AS second_cents,
              LAST_VALUE(cents) OVER w - FIRST_VALUE(cents) OVER w AS delta_cents
       FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             FROM orders)
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) = 1
       ORDER BY o_custkey LIMIT 300""",
)
def win_first_last(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, "orders", sf)
    base = orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        quantize(F.col("o_totalprice"), 100).alias("cents"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_rn = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        base.select(
            "o_custkey",
            F.count(F.lit(1)).over(w).alias("n_orders"),
            F.first("cents").over(w).alias("first_cents"),
            F.last("cents").over(w).alias("last_cents"),
            F.nth_value("cents", 2).over(w).alias("second_cents"),
            (F.last("cents").over(w) - F.first("cents").over(w)).alias("delta_cents"),
            F.row_number().over(w_rn).alias("_rn"),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .orderBy("o_custkey")
        .limit(300)
    )


@register(
    "x_win_streaks",
    "Longest consecutive-active-day streak per user — the classic "
    "gaps-and-islands window pattern (day minus per-user ROW_NUMBER is "
    "constant within an island, so islands fall out of one GROUP BY "
    "with no self-join or recursion). Two user-keyed passes that reuse "
    "one shuffle partitioning: the dedup-to-days aggregate and the "
    "island window; island lengths are exact integers.",
    """WITH d AS (
         SELECT DISTINCT user_id,
                date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dn
         FROM events
       ),
       i AS (
         SELECT user_id, dn,
                dn - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY dn)
                  AS island
         FROM d
       ),
       s AS (
         SELECT user_id, island, COUNT(*) AS len,
                MIN(dn) AS start_dn
         FROM i GROUP BY user_id, island
       )
       , m AS (
         SELECT user_id, MAX(len) AS longest, COUNT(*) AS n_streaks
         FROM s GROUP BY user_id
       )
       SELECT m.user_id,
              CAST(m.longest AS BIGINT) AS longest_streak,
              CAST(m.n_streaks AS BIGINT) AS n_streaks,
              CAST(MIN(s.start_dn) AS BIGINT) AS best_streak_start_dn
       FROM m JOIN s ON s.user_id = m.user_id AND s.len = m.longest
       GROUP BY m.user_id, m.longest, m.n_streaks
       ORDER BY m.user_id""",
)
def win_streaks(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, "events", sf)
    d = (
        ev.select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("dn"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("dn")
    i = d.withColumn("island", F.col("dn") - F.row_number().over(w))
    s = i.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len"), F.min("dn").alias("start_dn")
    )
    s = s.transform(pin_branch_point)
    m = s.groupBy("user_id").agg(
        F.max("len").alias("longest"), F.count(F.lit(1)).alias("n_streaks")
    )
    return (
        m.join(
            s,
            (m["user_id"] == s["user_id"]) & (s["len"] == m["longest"]),
        )
        .groupBy(m["user_id"], "longest", "n_streaks")
        .agg(F.min("start_dn").cast("bigint").alias("best_streak_start_dn"))
        .select(
            m["user_id"],
            F.col("longest").cast("bigint").alias("longest_streak"),
            F.col("n_streaks").cast("bigint").alias("n_streaks"),
            "best_streak_start_dn",
        )
        .orderBy("user_id")
    )


# -- share-of-total (RATIO_TO_REPORT) ------------------------------------------


@register(
    "x_win_ratio_to_report",
    "Share-of-total analytic (Oracle RATIO_TO_REPORT / unbounded-frame "
    "SUM window): each market segment's revenue share within its "
    "nation, as exact integer cents with a 1e-6 quantized share. The "
    "fact table aggregates FIRST (one partial-agg shuffle to the "
    "(nation, segment) grid, 125 rows), and the share window runs over "
    "that aggregate — the evaluate-window-over-rollup pattern that "
    "keeps unbounded frames off fact tables at any scale.",
    """WITH g AS (
         SELECT c_nationkey AS nation, c_mktsegment AS segment,
                CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS cents
         FROM customer JOIN orders ON o_custkey = c_custkey
         GROUP BY nation, segment
       )
       SELECT nation, segment, cents,
              CAST((cents * 1000000)
                   // SUM(cents) OVER (PARTITION BY nation) AS BIGINT)
                AS share_q6
       FROM g ORDER BY nation, segment""",
)
def q_ratio_to_report(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, "customer", sf)
    orders = load_table(spark, "orders", sf)
    g = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("nation")
    return (
        g.select(
            "nation",
            "segment",
            "cents",
            (F.col("cents") * 1000000).alias("_num"),
            F.sum("cents").over(w).alias("_den"),
        )
        .select(
            "nation",
            "segment",
            "cents",
            F.expr("_num div _den").cast("bigint").alias("share_q6"),
        )
        .orderBy("nation", "segment")
    )
