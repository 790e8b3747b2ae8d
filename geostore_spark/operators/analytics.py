"""Warehouse-analytics classics: RFM segmentation, market-basket lift.

The reference's catalogue answers "what datasets exist" (dataset CRUD,
``geostore/api_responses.py``); a warehouse engine also has to answer
"which entities matter" — the customer-value and product-affinity
rollups every retail/engagement stack runs. Both operators here follow
the repo's scale rules: global ranks go through the two-phase
``distributed_row_number`` (parallelism ∝ data, not ∝ 4 quartiles),
pair generation is per-order blocked (orders are small — never an
all-pairs pass over parts), and every probability/lift is a per-row
float over exact integer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geostore_spark.operators.util import distributed_row_number
from geostore_spark.registry import register
from geostore_spark.sources.tables import load_table

RFM_ANCHOR = "2026-01-01"  # fixed recency anchor → deterministic across runs
RFM_Q = 4

BASKET_MIN_SUPPORT = 2
BASKET_TOP = 20
LIFT_SCALE = 1_000_000


def _quartile(rn: str, n: str):
    # explicit floor formula, NOT NTILE: NTILE's "first buckets get one
    # extra row" tie layout differs between engines' docs; (rn-1)*Q//n+1
    # is one integer expression with identical semantics everywhere
    return (
        ((F.col(rn) - 1) * RFM_Q / F.col(n)).cast("bigint") + 1
    )


@register(
    "x_orders_rfm",
    "RFM (recency / frequency / monetary) customer segmentation — the "
    "classic customer-value rollup. One shuffle to per-customer "
    "aggregates, then THREE two-phase distributed ranks (recency, "
    "frequency, monetary — each range-partitioned, locally ranked, "
    "offset by broadcast prefix sums: parallelism ∝ customers, never "
    "the 1-partition global-window ceiling), explicit floor-formula "
    "quartiles (identical tie semantics on both engines), and a "
    "64-cell segment rollup. Monetary sums are exact cents.",
    f"""WITH base AS (
         SELECT o_custkey AS c,
                date_diff('day', MAX(o_orderdate), TIMESTAMP '{RFM_ANCHOR}')
                  AS rec_days,
                COUNT(*) AS freq,
                CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS cents
         FROM orders GROUP BY o_custkey
       ),
       n AS (SELECT COUNT(*) AS n FROM base),
       r AS (
         SELECT c, rec_days, freq, cents,
                ROW_NUMBER() OVER (ORDER BY rec_days, c) AS rn_r,
                ROW_NUMBER() OVER (ORDER BY freq DESC, c) AS rn_f,
                ROW_NUMBER() OVER (ORDER BY cents DESC, c) AS rn_m
         FROM base
       ),
       q AS (
         SELECT c, cents,
                (rn_r - 1) * {RFM_Q} // n.n + 1 AS rq,
                (rn_f - 1) * {RFM_Q} // n.n + 1 AS fq,
                (rn_m - 1) * {RFM_Q} // n.n + 1 AS mq
         FROM r CROSS JOIN n
       )
       SELECT rq, fq, mq, COUNT(*) AS n_customers,
              CAST(SUM(cents) AS BIGINT) AS seg_cents
       FROM q GROUP BY rq, fq, mq ORDER BY rq, fq, mq""",
)
def q_rfm(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, "orders", sf)
    base = orders.groupBy(F.col("o_custkey").alias("c")).agg(
        F.datediff(F.lit(RFM_ANCHOR), F.max("o_orderdate")).alias("rec_days"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )
    # per-customer frame feeds three rank passes, and each pass feeds two
    # consumers (the ranged data and its offsets side table) — checkpoint
    # between passes or the plan re-derives every earlier pass per branch
    base = base.localCheckpoint(eager=False)
    ranked, counts = distributed_row_number(base, [], ["rec_days", "c"], "rn_r")
    total = counts.select(F.sum("_n").cast("bigint").alias("n"))
    ranked = ranked.withColumn("neg_f", -F.col("freq")).localCheckpoint(eager=False)
    ranked, _ = distributed_row_number(ranked, [], ["neg_f", "c"], "rn_f")
    ranked = ranked.withColumn("neg_m", -F.col("cents")).localCheckpoint(eager=False)
    ranked, _ = distributed_row_number(ranked, [], ["neg_m", "c"], "rn_m")
    q = ranked.crossJoin(F.broadcast(total)).select(
        "c",
        "cents",
        _quartile("rn_r", "n").alias("rq"),
        _quartile("rn_f", "n").alias("fq"),
        _quartile("rn_m", "n").alias("mq"),
    )
    return (
        q.groupBy("rq", "fq", "mq")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("cents").cast("bigint").alias("seg_cents"),
        )
        .orderBy("rq", "fq", "mq")
    )


@register(
    "x_orders_basket_lift",
    "Market-basket association mining over part co-purchases: support, "
    "confidence and lift for every part pair sharing an order (min "
    "support 2), top-20 by lift. Pair generation is per-order blocked "
    "— orders are small, so the self-join never approaches all-pairs; "
    "pair counts and item supports are two partially-aggregated "
    "shuffles, item supports join back BROADCAST (vocabulary-sized), "
    "and the final cut is a TakeOrdered with an integer-quantized "
    "lift sort key (float lift never orders rows).",
    f"""WITH op AS (
         SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
       ),
       n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM op),
       item AS (SELECT p, COUNT(*) AS n_p FROM op GROUP BY p),
       pair AS (
         SELECT a.p AS pa, b.p AS pb, COUNT(*) AS n_ab
         FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
         GROUP BY a.p, b.p
         HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}
       ),
       scored AS (
         SELECT pair.pa, pair.pb, pair.n_ab, ia.n_p AS n_a, ib.n_p AS n_b,
                CAST(round(CAST(pair.n_ab AS DOUBLE) * n.n_orders
                           * {LIFT_SCALE} / (ia.n_p * ib.n_p)) AS BIGINT)
                  AS lift_q
         FROM pair JOIN item ia ON pair.pa = ia.p
                   JOIN item ib ON pair.pb = ib.p
                   CROSS JOIN n
       )
       SELECT pa, pb, n_ab, n_a, n_b,
              CAST(lift_q AS DOUBLE) / {LIFT_SCALE} AS lift,
              CAST(n_ab AS DOUBLE) / n_a AS confidence
       FROM scored
       ORDER BY lift_q DESC, pa, pb LIMIT {BASKET_TOP}""",
)
def q_basket_lift(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf)
    # ONE order-keyed shuffle builds the per-order distinct part set
    # (collect_set dedups in the aggregate — no separate distinct pass,
    # no order-keyed SELF-JOIN of the 6 M-row (o, p) table); orders are
    # small (<= ~7 parts), so the basket rows are bounded structs and
    # the in-row pair explode is a codegen expression, never a join.
    # n_orders and item supports both derive from the basket table —
    # every downstream pass reads the 4x-smaller grouped checkpoint.
    baskets = (
        li.groupBy(F.col("l_orderkey").alias("o"))
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .localCheckpoint(eager=False)
    )
    n = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    item = (
        baskets.select(F.explode("ps").alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n_p"))
    )
    pair = (
        baskets.selectExpr(
            """explode(flatten(transform(ps, (x, i) ->
                 transform(slice(ps, i + 2, size(ps)), y ->
                   struct(x as pa, y as pb))))) as pr"""
        )
        .groupBy(F.col("pr.pa").alias("pa"), F.col("pr.pb").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= BASKET_MIN_SUPPORT)
    )
    ia = item.select(F.col("p").alias("pa"), F.col("n_p").alias("n_a"))
    ib = item.select(F.col("p").alias("pb"), F.col("n_p").alias("n_b"))
    scored = (
        pair.join(F.broadcast(ia), "pa")
        .join(F.broadcast(ib), "pb")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "lift_q",
            F.round(
                F.col("n_ab").cast("double")
                * F.col("n_orders")
                * LIFT_SCALE
                / (F.col("n_a") * F.col("n_b")),
                0,
            ).cast("bigint"),
        )
    )
    return (
        scored.select(
            "pa",
            "pb",
            "n_ab",
            "n_a",
            "n_b",
            "lift_q",
            (F.col("lift_q").cast("double") / LIFT_SCALE).alias("lift"),
            (F.col("n_ab").cast("double") / F.col("n_a")).alias("confidence"),
        )
        .orderBy(F.desc("lift_q"), "pa", "pb")
        .limit(BASKET_TOP)
        .drop("lift_q")
    )


# -- ABC / Pareto revenue classification -------------------------------------

ABC_A, ABC_B = 50, 80  # cumulative-share breakpoints (percent)


@register(
    "x_part_abc_pareto",
    "ABC (Pareto) classification of parts by revenue: parts sorted by "
    "revenue descending, cumulative share computed, class A = first "
    "50% of revenue, B = next 30%, C = the tail — the 80/20 inventory "
    "screen. The global cumulative sum runs through the two-phase "
    "distributed prefix sum (range partition + local running sums + "
    "broadcast slice offsets — parallelism ∝ parts, never a 1-task "
    "global window); revenue is exact cents so every prefix is "
    "layout-independent. Class thresholds compare integer "
    "cross-products (cum*100 vs total*pct).",
    f"""WITH r AS (
         SELECT l_partkey AS p,
                CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                     AS BIGINT) AS cents
         FROM lineitem GROUP BY l_partkey
       ),
       c AS (
         SELECT p, cents,
                SUM(cents) OVER (ORDER BY cents DESC, p
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cum,
                SUM(cents) OVER () AS total
         FROM r
       ),
       k AS (
         SELECT p, cents,
                CASE WHEN cum * 100 <= total * {ABC_A} THEN 'A'
                     WHEN cum * 100 <= total * {ABC_B} THEN 'B'
                     ELSE 'C' END AS klass
         FROM c
       )
       SELECT klass, COUNT(*) AS n_parts,
              CAST(SUM(cents) AS BIGINT) AS class_cents,
              MIN(cents) AS min_cents, MAX(cents) AS max_cents
       FROM k GROUP BY klass ORDER BY klass""",
)
def q_abc_pareto(spark: SparkSession, sf: str) -> DataFrame:
    from geostore_spark.operators.util import distributed_prefix_sum

    li = load_table(spark, "lineitem", sf)
    r = li.groupBy(F.col("l_partkey").alias("p")).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )
    r = r.withColumn("neg", -F.col("cents")).localCheckpoint(eager=False)
    total = r.agg(F.sum("cents").cast("bigint").alias("total"))
    c = distributed_prefix_sum(r, [], ["neg", "p"], "cents", out_name="cum")
    k = c.crossJoin(F.broadcast(total)).select(
        "p",
        "cents",
        F.when(F.col("cum") * 100 <= F.col("total") * ABC_A, "A")
        .when(F.col("cum") * 100 <= F.col("total") * ABC_B, "B")
        .otherwise("C")
        .alias("klass"),
    )
    return (
        k.groupBy("klass")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("cents").cast("bigint").alias("class_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .orderBy("klass")
    )


# -- new vs returning revenue split ------------------------------------------


@register(
    "x_orders_repeat_rate",
    "New-vs-returning revenue split per quarter — the growth metric "
    "every subscription/commerce dashboard leads with (a rising "
    "returning share is retention working; a new-dominated mix is "
    "paid acquisition). The first-order timestamp per customer is one "
    "aggregate, broadcast back onto orders; the quarterly split "
    "partially aggregates exact cents on ≤2 x #quarters keys.",
    """WITH first_o AS (
         SELECT o_custkey AS c, MIN(o_orderdate) AS first_dt
         FROM orders GROUP BY o_custkey
       ),
       t AS (
         SELECT CAST(date_trunc('quarter', o.o_orderdate) AS VARCHAR) AS q,
                CASE WHEN o.o_orderdate = f.first_dt THEN 'new'
                     ELSE 'returning' END AS cohort,
                CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
         FROM orders o JOIN first_o f ON o.o_custkey = f.c
       )
       SELECT q, cohort, COUNT(*) AS n_orders,
              CAST(SUM(cents) AS BIGINT) AS revenue_cents
       FROM t GROUP BY q, cohort ORDER BY q, cohort LIMIT 200""",
)
def q_repeat_rate(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, "orders", sf)
    first_o = orders.groupBy(F.col("o_custkey").alias("c")).agg(
        F.min("o_orderdate").alias("first_dt")
    )
    t = (
        orders.join(F.broadcast(first_o), orders["o_custkey"] == first_o["c"])
        .select(
            F.date_trunc("quarter", "o_orderdate")
            .cast("date")
            .cast("string")
            .alias("q"),
            F.when(F.col("o_orderdate") == F.col("first_dt"), "new")
            .otherwise("returning")
            .alias("cohort"),
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
        )
    )
    return (
        t.groupBy("q", "cohort")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
        .orderBy("q", "cohort")
        .limit(200)
    )


# -- open-order backlog over time --------------------------------------------


@register(
    "x_orders_backlog",
    "Monthly open-order backlog via interval counting: each order is "
    "open from o_orderdate until its last line ships; +1/-1 boundary "
    "deltas per month prefix-sum into the standing backlog — the "
    "inventory-of-work curve ops dashboards track. The order->close "
    "join is big-big (left to AQE), the delta table is month-keyed "
    "(aggregate-sized), and the running sum is a window over that "
    "~80-row aggregate — never over the fact table. Months with no "
    "boundary events carry the previous value implicitly.",
    """WITH span AS (
         SELECT o.o_orderkey,
                year(o.o_orderdate) * 12 + month(o.o_orderdate) AS m_open,
                year(MAX(l.l_shipdate)) * 12 + month(MAX(l.l_shipdate)) + 1
                  AS m_close
         FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         GROUP BY o.o_orderkey, o.o_orderdate
       ),
       delta AS (
         SELECT m_open AS m, 1 AS d FROM span
         UNION ALL
         SELECT m_close AS m, -1 AS d FROM span
       ),
       agg AS (
         SELECT m, CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS opened,
                CAST(SUM(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS closed,
                CAST(SUM(d) AS BIGINT) AS net
         FROM delta GROUP BY m
       )
       SELECT m AS month_key, opened, closed,
              CAST(SUM(net) OVER (ORDER BY m
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS backlog
       FROM agg ORDER BY month_key""",
)
def q_orders_backlog(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, "orders", sf)
    li = load_table(spark, "lineitem", sf)
    span = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m_open"),
            (F.year("last_ship") * 12 + F.month("last_ship") + 1).alias("m_close"),
        )
    )
    delta = span.select(F.col("m_open").alias("m"), F.lit(1).alias("d")).unionAll(
        span.select(F.col("m_close").alias("m"), F.lit(-1).alias("d"))
    )
    agg = delta.groupBy("m").agg(
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).cast("bigint").alias("opened"),
        F.sum(F.when(F.col("d") == -1, 1).otherwise(0)).cast("bigint").alias("closed"),
        F.sum("d").cast("bigint").alias("net"),
    )
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return agg.select(
        F.col("m").alias("month_key"),
        "opened",
        "closed",
        F.sum("net").over(w).cast("bigint").alias("backlog"),
    ).orderBy("month_key")


# -- skyline / Pareto-dominance query ----------------------------------------


@register(
    "x_orders_skyline",
    "Skyline (Pareto-dominance) query over per-account-bucket "
    "profiles (1000 hash buckets, so the profile table is "
    "scale-independent): keep every bucket whose (best order value, "
    "earliest date) is not dominated — higher-or-equal value AND "
    "earlier-or-equal date, strict in one — by any other bucket. The "
    "Spark plan is the sort-sweep formulation: two windows over the "
    "bucket-sized rollup (strictly-earlier running max via RANGE ... "
    "1 PRECEDING, same-day max) replace the O(n^2) pairwise test. The "
    "ORACLE deliberately uses the semantic NOT EXISTS dominance "
    "definition instead — the two formulations agreeing is the "
    "correctness argument for the sweep.",
    """WITH c AS (
         SELECT o_custkey % 1000 AS clerk,
                CAST(MAX(FLOOR(o_totalprice)) AS BIGINT) AS best_value,
                CAST(MIN(date_diff('day', DATE '1970-01-01', o_orderdate))
                     AS BIGINT) AS first_day
         FROM orders GROUP BY clerk
       )
       SELECT CAST(clerk AS BIGINT) AS clerk, best_value, first_day
       FROM c p
       WHERE NOT EXISTS (
         SELECT 1 FROM c q
         WHERE q.first_day <= p.first_day AND q.best_value >= p.best_value
           AND (q.first_day < p.first_day OR q.best_value > p.best_value)
       )
       ORDER BY first_day, best_value DESC, clerk""",
)
def q_orders_skyline(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, "orders", sf)
    c = orders.groupBy((F.col("o_custkey") % 1000).cast("bigint").alias("clerk")).agg(
        F.max(F.floor("o_totalprice")).cast("bigint").alias("best_value"),
        F.min(
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
        )
        .cast("bigint")
        .alias("first_day"),
    )
    # dominated iff (a) some strictly-earlier clerk reached >= value, or
    # (b) a same-day clerk reached strictly more
    prior = (
        Window.orderBy("first_day")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    same_day = Window.partitionBy("first_day")
    sky = c.select(
        "clerk",
        "best_value",
        "first_day",
        F.max("best_value").over(prior).alias("_best_prior"),
        F.max("best_value").over(same_day).alias("_day_max"),
    ).filter(
        (F.col("_best_prior").isNull() | (F.col("_best_prior") < F.col("best_value")))
        & (F.col("best_value") == F.col("_day_max"))
    )
    return sky.select("clerk", "best_value", "first_day").orderBy(
        "first_day", F.col("best_value").desc(), "clerk"
    )
