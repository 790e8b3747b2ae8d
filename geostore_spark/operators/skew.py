"""Skew-aware aggregation: salting and two-phase shapes.

AQE's skew-join splitting (on in session.py) handles skewed *joins*; what
it cannot fix is aggregation state funneling into one reducer — a heavy-
hitter key whose per-key state is large (distinct sets, collected lists).
Two shapes fix that, both pure DataFrame compositions:

- ``salted_aggregate``: decomposable aggs (sum/count/min/max) over
  ``groupBy(keys, salt)`` then re-aggregated over ``keys``. The salt
  spreads one hot key over N reducers; phase 2 touches N rows per key.
- ``two_phase_distinct_count``: exact COUNT(DISTINCT col) per key as
  dedup-then-count — ``groupBy(keys, col).count`` spreads by (key, col)
  so no reducer ever holds a hot key's whole distinct set, then a cheap
  ``groupBy(keys).count``.

At sf0.1 these match the naive plans' speed; their point is the 100 TB
failure mode they remove. Results are bit-identical to the naive form —
pinned by tests and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geostore_spark.registry import register
from geostore_spark.sources.tables import load_table

DEFAULT_SALT_BUCKETS = 16


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Two-phase decomposable aggregate (count/sum/min/max of
    ``value_col`` per ``keys``) with a salt spreading each key over
    ``salt_buckets`` reducers. ``spark_partition_id``-derived salt keeps
    the expression deterministic-per-task without a rand() column."""
    salted = df.withColumn("_salt", F.spark_partition_id() % salt_buckets)
    # decimal sum: exact (associative) regardless of phase/partition
    # grouping order — float sums would drift in the last ulp vs a
    # single-phase plan
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col(value_col).cast("decimal(28,6)")).alias("_sum"),
        F.min(value_col).alias("_min"),
        F.max(value_col).alias("_max"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias("n"),
        F.sum("_sum").alias("sum_v"),
        F.min("_min").alias("min_v"),
        F.max("_max").alias("max_v"),
    )


def two_phase_distinct_count(
    df: DataFrame, keys: list[str], col: str
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT col) that never ships a hot key's
    full distinct set to one reducer: shuffle on (keys, col), then count
    the deduplicated rows per key."""
    deduped = df.select(*keys, col).distinct()
    return deduped.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_distinct"))


@register(
    "x_skew_distinct",
    "Skew-safe exact distinct count per key (dedup-then-count two-phase; "
    "no reducer holds a hot key's whole distinct set).",
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
       FROM events GROUP BY event_type ORDER BY event_type""",
)
def q_skew_distinct(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, "events", sf)
    return two_phase_distinct_count(ev, ["event_type"], "user_id").orderBy("event_type")


@register(
    "x_skew_salted_agg",
    "Salted two-phase decomposable aggregate: a hot key's rows spread "
    "over N reducers in phase 1, N partial rows combined in phase 2.",
    """SELECT event_type, COUNT(*) AS n,
              CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_v,
              ROUND(MIN(value), 4) AS min_v, ROUND(MAX(value), 4) AS max_v
       FROM events GROUP BY event_type ORDER BY event_type""",
)
def q_salted_agg(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, "events", sf)
    out = salted_aggregate(ev, ["event_type"], "value")
    return out.select(
        "event_type",
        "n",
        F.col("sum_v").cast("double").alias("sum_v"),
        F.round("min_v", 4).alias("min_v"),
        F.round("max_v", 4).alias("max_v"),
    ).orderBy("event_type")
