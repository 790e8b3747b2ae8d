"""Incremental view maintenance over the snapshot store's change feed.

The reference maintains derived metadata incrementally — the catalog
update appends ONE child link instead of rebuilding the catalog
(``geostore/populate_catalog/task.py:89-105``), and dataset versions
accrete instead of rewriting history. Generalized to analytics: a
materialized aggregate (per-key counts + exact sums) refreshed by
applying the store's CDF deltas, so the refresh SHUFFLE is
proportional to CHANGED rows, never table size: the only exchange in
an incremental refresh is the delta aggregation; the view side is
probed by a key merge (broadcast-sized delta -> broadcast join, no
view shuffle), and the snapshot commit is a shuffle-free rewrite of an
aggregate-sized table. At 100 TB a full recompute of a daily rollup
re-shuffles the world; applying a day's delta shuffles a day.

Algebra: counts and sums form a commutative group under signed-row
addition (insert = +1, delete = -1), so any churn the CDF can express
— updates, deletes, multiplicity shifts — folds into the view with one
delta aggregation plus one key merge; keys whose count reaches zero
are deleted by the merge (WHEN MATCHED ... DELETE). (AVG and friends
derive from (sum, count); MIN/MAX are NOT group-invertible and would
need a recompute-on-retract path — out of scope here, and the view
refuses nothing silently: it only offers sums and counts.)

The view itself lives in the same snapshot store, so refreshes are
OCC-protected and versioned like every other write. The applied
source version rides each view commit as TRANSACTION METADATA
(``store.commit_meta`` — Delta's ``txn`` shape), so (a) it is atomic
with the fold: a crash between "merge committed" and "version
recorded" cannot exist, and a replayed refresh is a provable noop;
and (b) it is independent of the view ROWS: a view legitimately
drained to zero keys still knows exactly which source version it
reflects (an in-row high-water mark would read as "never built" and
wedge the next refresh on a create-vs-exists conflict).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geostore_spark.sources.store import MetadataStore


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
        """Last source version folded into the view, from the view's
        commit metadata — None only when the view was never built (or
        its latest commit was made outside refresh(), which demands a
        rebuild). Missing-table is detected by the store's version
        pointer, never by a catch-all (a real read error must surface,
        not silently force a full rebuild)."""
        if self.store.current_version(self.name) < 0:
            return None
        v = self.store.commit_meta(self.name).get("ivm_applied")
        return None if v is None else int(v)

    def _delta_frame(self, applied: int, cur: int) -> DataFrame:
        """Signed per-key delta aggregate between two source versions —
        the ONLY shuffle an incremental refresh performs."""
        cdf = self.store.changes(self.source, applied, cur)
        sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
        return self._aggregate(cdf.withColumn("__w", sign), F.col("__w"))

    # -- API -----------------------------------------------------------------

    def refresh(self) -> dict:
        """Bring the view up to the source's current version.

        First call = full build. Later calls read ONLY the CDF between
        the last applied version and current, aggregate the deltas
        signed (insert +1 / delete -1), and key-MERGE them into the
        view: matched keys add the delta to their running count/sums,
        keys whose count reaches zero are deleted, unmatched delta keys
        insert. Returns a small stats dict (the logging breadcrumb a
        pipeline records per refresh)."""
        cur = self.store.current_version(self.source)
        applied = self._applied_version()
        meta = {"ivm_applied": cur}
        if applied is None:
            built = self._aggregate(self.store.read(self.source), F.lit(1))
            if self.store.current_version(self.name) >= 0:
                self.store.overwrite(self.name, built, meta=meta)
            else:
                self.store.create(self.name, built, meta=meta)
            return {"mode": "full", "source_version": cur}
        if applied == cur:
            return {"mode": "noop", "source_version": cur}
        delta = self._delta_frame(applied, cur)
        val_cols = ["n_rows"] + [f"sum_{c}" for c in self.sum_cols]
        self.store.merge(
            self.name,
            delta,
            on=self.keys,
            source_cols=val_cols,
            when_matched_set={
                c: (F.col(c) + F.col(f"__src_{c}")).cast("bigint")
                for c in val_cols
            },
            delete_matched_where=F.col("n_rows") == 0,
            insert_not_matched=True,
            meta=meta,
        )
        return {"mode": "incremental", "from": applied, "to": cur}

    def read(self) -> DataFrame:
        return self.store.read(self.name)

    def recompute(self) -> DataFrame:
        """The full-scan answer (test oracle / audit path)."""
        return self._aggregate(self.store.read(self.source), F.lit(1))
