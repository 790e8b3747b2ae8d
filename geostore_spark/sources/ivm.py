"""Incremental view maintenance over the snapshot store's change feed.

The reference maintains derived metadata incrementally — the catalog
update appends ONE child link instead of rebuilding the catalog
(``geostore/populate_catalog/task.py:89-105``), and dataset versions
accrete instead of rewriting history. Generalized to analytics: a
materialized aggregate (per-key counts + exact sums) refreshed by
applying the store's CDF deltas, so refresh cost is proportional to
CHANGED rows, never table size. At 100 TB a full recompute of a daily
rollup re-shuffles the world; applying a day's delta shuffles a day.

Algebra: counts and sums form a commutative group under signed-row
addition (insert = +1, delete = -1), so any churn the CDF can express
— updates, deletes, multiplicity shifts — folds into the view with one
delta aggregation plus one key-outer merge; keys whose count reaches
zero drop out. (AVG and friends derive from (sum, count); MIN/MAX are
NOT group-invertible and would need a recompute-on-retract path — out
of scope here, and the view refuses nothing silently: it only offers
sums and counts.)

The view itself lives in the same snapshot store, so refreshes are
OCC-protected and versioned like every other write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geostore_spark.sources.store import MetadataStore

_META_COL = "__ivm_source_version"


class IncrementalAggView:
    """Materialized ``SELECT keys, COUNT(*), SUM(cols)...`` over a store
    table, maintained from the change feed.

    ``sum_cols`` should be exact-typed (integer cents, not floats):
    group-inverse arithmetic on floats would drift under churn.
    """

    def __init__(
        self,
        store: MetadataStore,
        source: str,
        keys: list[str],
        sum_cols: list[str],
        name: str | None = None,
    ) -> None:
        self.store = store
        self.source = source
        self.keys = list(keys)
        self.sum_cols = list(sum_cols)
        self.name = name or f"__view_{source}_{'_'.join(keys)}"

    # -- internals -----------------------------------------------------------

    def _aggregate(self, df: DataFrame, weight) -> DataFrame:
        aggs = [F.sum(weight).cast("bigint").alias("n_rows")] + [
            F.sum(F.col(c) * weight).cast("bigint").alias(f"sum_{c}")
            for c in self.sum_cols
        ]
        return df.groupBy(*self.keys).agg(*aggs)

    def _applied_version(self) -> int | None:
        try:
            row = (
                self.store.read(self.name)
                .select(F.max(_META_COL).alias("v"))
                .collect()[0]
            )
            return int(row["v"]) if row["v"] is not None else None
        except Exception:
            return None

    # -- API -----------------------------------------------------------------

    def refresh(self) -> dict:
        """Bring the view up to the source's current version.

        First call = full build. Later calls read ONLY the CDF between
        the last applied version and current, aggregate the deltas
        signed (insert +1 / delete -1), and merge them into the view by
        key; zero-count keys drop. Returns a small stats dict (the
        logging breadcrumb a pipeline records per refresh)."""
        cur = self.store.current_version(self.source)
        applied = self._applied_version()
        if applied is None:
            built = self._aggregate(
                self.store.read(self.source), F.lit(1)
            ).withColumn(_META_COL, F.lit(cur))
            self.store.create(self.name, built)
            return {"mode": "full", "source_version": cur}
        if applied == cur:
            return {"mode": "noop", "source_version": cur}
        cdf = self.store.changes(self.source, applied, cur)
        sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
        delta = self._aggregate(
            cdf.withColumn("__w", sign), F.col("__w")
        )
        old = self.store.read(self.name).drop(_META_COL)
        old = old.withColumnRenamed("n_rows", "__old_n")
        delta = delta.withColumnRenamed("n_rows", "__d_n")
        for c in self.sum_cols:
            old = old.withColumnRenamed(f"sum_{c}", f"__old_s_{c}")
            delta = delta.withColumnRenamed(f"sum_{c}", f"__d_s_{c}")
        merged = old.join(delta, self.keys, "full_outer")
        out_cols = [
            (
                F.coalesce(F.col("__old_n"), F.lit(0))
                + F.coalesce(F.col("__d_n"), F.lit(0))
            )
            .cast("bigint")
            .alias("n_rows")
        ] + [
            (
                F.coalesce(F.col(f"__old_s_{c}"), F.lit(0))
                + F.coalesce(F.col(f"__d_s_{c}"), F.lit(0))
            )
            .cast("bigint")
            .alias(f"sum_{c}")
            for c in self.sum_cols
        ]
        new = (
            merged.select(*self.keys, *out_cols)
            .filter(F.col("n_rows") != 0)
            .withColumn(_META_COL, F.lit(cur))
        )
        self.store.overwrite(self.name, new)
        return {"mode": "incremental", "from": applied, "to": cur}

    def read(self) -> DataFrame:
        return self.store.read(self.name).drop(_META_COL)

    def recompute(self) -> DataFrame:
        """The full-scan answer (test oracle / audit path)."""
        return self._aggregate(self.store.read(self.source), F.lit(1))
