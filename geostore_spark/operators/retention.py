"""Cohort retention and conversion-funnel analytics over ``events``.

The reference's event surface is orchestration-status notification
(geostore/notify_status_update/task.py:77-135 — per-event fan-out, no
longitudinal analysis); these are the two longitudinal operators every
event warehouse runs at scale, expressed so the heavy work rides ONE
shuffle keyed on ``user_id`` (the natural ingest partition key):

- retention: per-user state (first-event cohort + active-month set)
  collapses in a single user-keyed aggregation — map-side partial
  aggregation dedups months before the shuffle — then a tiny
  (cohort, offset) rollup. No second full-data shuffle on a
  different key, which is what the naive DISTINCT-months-then-join
  formulation costs.
- funnel: first-signup per user collapses to a |users|-row dimension
  that Catalyst broadcasts onto the filtered purchase stream (the
  verified plan at sf0.1: BroadcastExchange, zero purchase-side
  shuffle before the per-user aggregate); past broadcast size the same
  plan degrades gracefully to a sort-merge join where both sides
  shuffle once on the shared user_id key.

All output columns are exact integers (month indexes, day buckets,
counts), so the DuckDB oracles hash-match without float normalization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from geostore_spark.registry import register
from geostore_spark.sources.tables import load_table

US_PER_DAY = 86_400_000_000


def _month_idx(ts_col: Column) -> Column:
    return (F.year(ts_col) * 12 + F.month(ts_col)).cast("bigint")


@register(
    "x_events_retention",
    "Cohort retention triangle: users bucketed by first-event month, "
    "active-user counts per (cohort, months-since). One user_id-keyed "
    "shuffle computes per-user state (min ts + month set, dedup'd "
    "map-side); the rollup shuffle is cohort-sized, not data-sized.",
    """WITH per_user AS (
         SELECT user_id,
                CAST(year(MIN(ts)) * 12 + month(MIN(ts)) AS BIGINT) AS cohort_m
         FROM events GROUP BY user_id
       ),
       act AS (
         SELECT DISTINCT user_id,
                CAST(year(ts) * 12 + month(ts) AS BIGINT) AS m
         FROM events
       )
       SELECT p.cohort_m, a.m - p.cohort_m AS months_since,
              COUNT(DISTINCT a.user_id) AS active_users
       FROM act a JOIN per_user p ON a.user_id = p.user_id
       GROUP BY p.cohort_m, months_since
       ORDER BY p.cohort_m, months_since""",
)
def q_retention(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, "events", sf)
    # one user-keyed aggregation carries all per-user state; collect_set
    # dedups months map-side so the shuffle moves |users| rows
    per_user = ev.groupBy("user_id").agg(
        _month_idx(F.min("ts")).alias("cohort_m"),
        F.collect_set(_month_idx(F.col("ts"))).alias("months"),
    )
    return (
        per_user.select(
            "user_id", "cohort_m", F.explode("months").alias("m")
        )
        .groupBy("cohort_m", (F.col("m") - F.col("cohort_m")).alias("months_since"))
        .agg(F.count_distinct("user_id").alias("active_users"))
        .orderBy("cohort_m", "months_since")
    )


@register(
    "x_events_funnel",
    "Signup->purchase conversion funnel: first purchase at-or-after each "
    "user's first signup, conversion-latency histogram in whole days. "
    "The per-user signup dimension broadcasts onto the filtered purchase "
    "stream (sort-merge on user_id past broadcast size); day bucket = "
    "exact integer microsecond difference through one IEEE "
    "floor-division.",
    f"""WITH s AS (
         SELECT user_id, MIN(CASE WHEN event_type = 'signup' THEN ts END) AS s_ts
         FROM events GROUP BY user_id
       ),
       p AS (
         SELECT e.user_id, MIN(e.ts) AS p_ts, MIN(s.s_ts) AS s_ts
         FROM events e JOIN s ON e.user_id = s.user_id
         WHERE e.event_type = 'purchase' AND s.s_ts IS NOT NULL
           AND e.ts >= s.s_ts
         GROUP BY e.user_id
       )
       SELECT CAST(FLOOR(CAST(epoch_us(p_ts) - epoch_us(s_ts) AS DOUBLE)
                         / {US_PER_DAY}.0) AS BIGINT) AS days_to_convert,
              COUNT(*) AS conversions
       FROM p GROUP BY days_to_convert ORDER BY days_to_convert""",
)
def q_funnel(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, "events", sf)
    s = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("s_ts")
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s.filter(F.col("s_ts").isNotNull()), "user_id")
        .filter(F.col("ts") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"), F.min("s_ts").alias("s_ts"))
    )
    days = F.floor(
        (F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("s_ts"))).cast("double")
        / F.lit(float(US_PER_DAY))
    ).cast("bigint")
    return (
        p.select(days.alias("days_to_convert"))
        .groupBy("days_to_convert")
        .agg(F.count(F.lit(1)).alias("conversions"))
        .orderBy("days_to_convert")
    )


@register(
    "x_events_dau_mau",
    "Engagement stickiness: daily and monthly active users per month "
    "with the avg-DAU/MAU ratio — the product-analytics companion to "
    "the retention triangle. Two partially-aggregated rollups of the "
    "SAME (day, user) dedup pass (months derive from days, so the "
    "expensive per-user dedup shuffle happens once); exact integer "
    "counts, one rounded ratio.",
    """WITH du AS (
         SELECT DISTINCT CAST(year(ts) * 12 + month(ts) AS BIGINT) AS m,
                CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT)
                  AS d,
                user_id
         FROM events
       ),
       dau AS (SELECT m, d, COUNT(*) AS dau FROM du GROUP BY m, d),
       mau AS (SELECT m, COUNT(DISTINCT user_id) AS mau FROM du GROUP BY m)
       SELECT mau.m, CAST(COUNT(*) AS BIGINT) AS n_days,
              CAST(MAX(mau.mau) AS BIGINT) AS mau,
              ROUND(AVG(CAST(dau.dau AS DOUBLE)) / MAX(mau.mau), 4)
                AS stickiness
       FROM dau JOIN mau ON dau.m = mau.m
       GROUP BY mau.m ORDER BY mau.m""",
)
def q_dau_mau(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, "events", sf)
    m = (F.year("ts") * 12 + F.month("ts")).cast("bigint")
    d = (
        F.year("ts") * 10000 + F.month("ts") * 100 + F.dayofmonth("ts")
    ).cast("bigint")
    du = ev.select(m.alias("m"), d.alias("d"), "user_id").distinct()
    dau = du.groupBy("m", "d").agg(F.count(F.lit(1)).alias("dau"))
    mau = du.groupBy("m").agg(F.count_distinct("user_id").alias("mau"))
    return (
        dau.join(F.broadcast(mau), "m")
        .groupBy("m")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.max("mau").cast("bigint").alias("mau"),
            F.round(
                F.avg(F.col("dau").cast("double")) / F.max("mau"), 4
            ).alias("stickiness"),
        )
        .orderBy("m")
    )


# -- cohort lifetime value ---------------------------------------------------


@register(
    "x_events_cohort_ltv",
    "Cohort lifetime-value curve: customers grouped by first-purchase "
    "quarter, revenue accumulated by quarters-since-acquisition — the "
    "retention triangle's revenue twin and the payback-period input. "
    "The acquisition date comes from a MIN window over the customer "
    "key — ONE customer-keyed shuffle of the fact, no join (the "
    "per-customer dim is customers-sized, NOT bounded-small: the "
    "broadcast-back form dies at scale and paid two fact passes "
    "here); revenue buckets "
    "partially aggregate on (cohort_q, quarters_since) — at 100 TB "
    "nothing but cohort-sized rollups ever reach a single node. "
    "Revenue sums are exact cents.",
    """WITH acq AS (
         SELECT o_custkey AS c, MIN(CAST(o_orderdate AS DATE)) AS first_day
         FROM orders GROUP BY o_custkey
       ),
       rev AS (
         SELECT CAST(date_trunc('quarter', a.first_day) AS VARCHAR) AS cohort_q,
                (year(o.o_orderdate) * 4 + quarter(o.o_orderdate))
                  - (year(a.first_day) * 4 + quarter(a.first_day))
                  AS quarters_since,
                CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
         FROM orders o JOIN acq a ON o.o_custkey = a.c
       )
       SELECT cohort_q, CAST(quarters_since AS BIGINT) AS quarters_since,
              COUNT(*) AS n_orders,
              CAST(SUM(cents) AS BIGINT) AS revenue_cents
       FROM rev GROUP BY cohort_q, quarters_since
       ORDER BY cohort_q, quarters_since
       LIMIT 400""",
)
def q_cohort_ltv(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, "orders", sf)
    q_idx = lambda col: F.year(col) * 4 + F.quarter(col)  # noqa: E731
    rev = (
        orders.select(
            "o_custkey",
            "o_orderdate",
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
        .withColumn(
            "first_day",
            F.min(F.to_date("o_orderdate")).over(Window.partitionBy("o_custkey")),
        )
        .select(
            F.date_trunc("quarter", "first_day").cast("date").cast("string").alias(
                "cohort_q"
            ),
            (q_idx(F.col("o_orderdate")) - q_idx(F.col("first_day")))
            .cast("bigint")
            .alias("quarters_since"),
            "cents",
        )
    )
    return (
        rev.groupBy("cohort_q", "quarters_since")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
        .orderBy("cohort_q", "quarters_since")
        .limit(400)
    )
