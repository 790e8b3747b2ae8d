"""Runtime-filter (Bloom) pushdown for selective joins.

The reference validates fixed manifests, so its joins are all
key-complete; a 100 TB engine instead constantly joins a huge fact
stream against a *selectively filtered* dimension. The standard
cluster-scale move — what Spark's own InjectRuntimeFilter rule and the
reference's batch-job fan-out (``geostore/populate_catalogue/task.py``'s
targeted message routing) both approximate — is to distill the build
side into a constant-size Bloom bitmap, broadcast it, and prune the
probe side *inside its scan stage* before any shuffle happens.

Design for scale:

- The bitmap is fixed-size (``BLOOM_BITS`` bits = 8 KiB) regardless of
  data volume — the only driver-collected state, same contract as the
  centroid/codebook collections in ``operators/similarity.py``.
- The probe-side pre-filter is a pure codegen expression (two
  xxhash64-derived bit probes against an array literal — native JVM
  hashing, no string building, ~10x cheaper per row than a digest): it
  evaluates in the parquet scan stage, so at 1000 executors the ~95% of
  fact rows with non-matching keys never leave their scan task — the
  shuffle into the verify join carries only Bloom survivors.
- Bloom filters admit false positives, so an exact broadcast semi join
  runs AFTER the pre-filter: the result is provably identical to the
  plain semi join (the oracle), while the expensive path is only paid by
  survivors. False negatives are impossible (every build key sets its
  bits), so no row is lost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from geostore_spark.registry import register
from geostore_spark.sources.tables import load_table

BLOOM_BITS = 1 << 16  # 65536 bits = 1024 longs = 8 KiB broadcast
_WORDS = BLOOM_BITS // 64

# Build-side predicate: ~5% of customers — selective enough that the
# Bloom pre-filter prunes most orders before the verify join.
SEGMENT = "BUILDING"
MIN_BAL = 7500.0


def _positions(key: Column) -> list[Column]:
    """Two independent xxhash64-derived bit positions for a join key.

    xxhash64 is a native Catalyst expression (whole-stage codegen, no
    string concat, no digest): the per-row probe cost must stay below
    the shuffle it saves, and hashing the raw key with two seeds is an
    order of magnitude cheaper than md5-of-concatenated-string. Hash
    portability to the oracle is NOT required — the exact verify join
    after the pre-filter makes the result provably identical to the
    plain semi join regardless of which hash the Bloom uses.
    """
    return [F.pmod(F.xxhash64(F.lit(i), key), F.lit(BLOOM_BITS)) for i in (1, 2)]


def build_bloom_words(keys: DataFrame, key_col: str) -> list[int]:
    """Distill a key set into a 1024-long bitmap.

    Positions reach the driver bounded by 2x the build-side key count
    (and by construction < BLOOM_BITS distinct values) — constant-size,
    like a k-means centroid collect. No distinct() shuffle: OR-ing into
    the bitmap is idempotent, so duplicate positions cost nothing and
    the build is a single scan stage.
    """
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col)))).alias("pos")
    )
    words = [0] * _WORDS
    for row in pos.collect():
        p = int(row["pos"])
        words[p // 64] |= 1 << (p % 64)
    # literal array wants signed 64-bit values
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(key: Column, words: list[int]) -> Column:
    """Codegen-only membership probe: both bit positions must be set."""
    lit_words = F.lit(words)
    cond = F.lit(True)
    for pos in _positions(key):
        word = F.element_at(lit_words, (pos / 64).cast("int") + 1)
        cond = cond & (F.bit_get(word, (pos % 64).cast("int")) == 1)
    return cond


@register(
    "x_join_bloom_semi",
    "Runtime Bloom-filter pushdown semi join: qualifying customers "
    "(one segment, high balance — ~5% selective) are distilled into an "
    "8 KiB bitmap broadcast to every orders scan task; orders that fail "
    "the two-probe membership test are dropped INSIDE the scan stage, "
    "and only Bloom survivors pay the exact broadcast-semi-join verify "
    "that removes false positives. Result provably equals the plain "
    "semi join (the oracle); at 1000 executors the fact stream is "
    "pruned before any shuffle or join build.",
    f"""SELECT o.o_orderstatus,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS total_cents
        FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM customer c
          WHERE c.c_custkey = o.o_custkey
            AND c.c_mktsegment = '{SEGMENT}' AND c.c_acctbal > {MIN_BAL}
        )
        GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus""",
)
def q_bloom_semi(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, "customer", sf)
    orders = load_table(spark, "orders", sf)
    keys = cust.filter(
        (F.col("c_mktsegment") == SEGMENT) & (F.col("c_acctbal") > MIN_BAL)
    ).select("c_custkey")
    words = build_bloom_words(keys, "c_custkey")
    pruned = orders.filter(bloom_might_contain(F.col("o_custkey"), words))
    exact = pruned.join(
        F.broadcast(keys), pruned["o_custkey"] == keys["c_custkey"], "left_semi"
    )
    return (
        exact.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("total_cents"),
        )
        .orderBy("o_orderstatus")
    )
