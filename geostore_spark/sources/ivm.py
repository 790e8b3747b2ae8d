"""Incremental view maintenance over the snapshot store's change feed.

The reference maintains derived metadata incrementally — the catalog
update appends ONE child link instead of rebuilding the catalog
(``geostore/populate_catalog/task.py:89-105``), and dataset versions
accrete instead of rewriting history. Generalized to analytics: a
materialized aggregate (per-key counts + exact sums + min/max)
refreshed by applying the store's CDF deltas, so the refresh SHUFFLE is
proportional to CHANGED rows, never table size: the only exchange in
an incremental refresh is the delta aggregation; the view side is
probed by a key merge (broadcast-sized delta -> broadcast join, no
view shuffle), and the snapshot commit is a shuffle-free rewrite of an
aggregate-sized table. At 100 TB a full recompute of a daily rollup
re-shuffles the world; applying a day's delta shuffles a day.

Algebra, two tiers:

* **Group-invertible** (counts, sums): signed-row addition (insert =
  +1, delete = -1) folds any churn into the view with one delta
  aggregation plus one key merge; keys whose count reaches zero are
  deleted by the merge (WHEN MATCHED ... DELETE). NULL semantics are
  exact, not approximated: each sum column carries a non-null-count
  companion, the internal running sum treats NULL as 0, and ``read()``
  restores SQL's SUM-of-all-NULLs-is-NULL at projection time — so a
  delta whose changed rows all carry NULL can never poison the running
  sum, and a key retracted down to only-NULL values reads back NULL
  exactly like a recompute would.
* **Non-invertible** (MIN/MAX — the reference's own ``asset_summaries``
  are min/max datetime ranges, SURVEY §2 A4 /
  ``/root/reference/tests/stac_generators.py:63-81``): the standard
  recompute-on-retract treatment. Insert-only delta keys fold
  incrementally (LEAST/GREATEST, whose null-skipping matches MIN/MAX's);
  only keys that saw a delete in the delta window are re-aggregated
  from the current source snapshot, via a broadcast semi-join of
  exactly those keys. A delete-free refresh therefore never touches
  the source snapshot beyond the CDF diff itself — pinned by a
  read-call spy in ``tests/test_ivm.py``.

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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geostore_spark.operators.util import quantize
from geostore_spark.sources.store import MetadataStore, null_safe_on


class IncrementalAggView:
    """Materialized ``SELECT keys, COUNT(*), SUM(cols)..., MIN/MAX(cols)...``
    over a store table, maintained from the change feed.

    ``sum_cols`` should be exact-typed (integer cents, not floats):
    group-inverse arithmetic on floats would drift under churn.
    ``minmax_cols`` may be any orderable type; they are maintained
    incrementally on inserts and recomputed per-key on retraction.
    """

    def __init__(
        self,
        store: MetadataStore,
        source: str,
        keys: list[str],
        sum_cols: list[str],
        minmax_cols: list[str] | None = None,
        name: str | None = None,
    ) -> None:
        self.store = store
        self.source = source
        self.keys = list(keys)
        self.sum_cols = list(sum_cols)
        self.minmax_cols = list(minmax_cols or [])
        self.name = name or f"__view_{source}_{'_'.join(keys)}"

    # -- internals -----------------------------------------------------------

    @property
    def _val_cols(self) -> list[str]:
        """Stored (internal) value columns, merge-assignment order."""
        return (
            ["n_rows"]
            + [f"sum_{c}" for c in self.sum_cols]
            + [f"__nn_{c}" for c in self.sum_cols]
            + [f"min_{c}" for c in self.minmax_cols]
            + [f"max_{c}" for c in self.minmax_cols]
        )

    def _build_frame(self, df: DataFrame) -> DataFrame:
        """Full-build internal aggregate: NULL-as-0 running sums plus
        their non-null counts, natural MIN/MAX."""
        aggs: list[Column] = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
        for c in self.sum_cols:
            aggs.append(
                F.sum(F.coalesce(F.col(c), F.lit(0))).cast("bigint").alias(f"sum_{c}")
            )
        for c in self.sum_cols:
            aggs.append(F.count(F.col(c)).cast("bigint").alias(f"__nn_{c}"))
        for c in self.minmax_cols:
            aggs.append(F.min(F.col(c)).alias(f"min_{c}"))
        for c in self.minmax_cols:
            aggs.append(F.max(F.col(c)).alias(f"max_{c}"))
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
        the ONLY shuffle a delete-free incremental refresh performs.
        Carries ``__has_del`` (any retraction for the key in the window)
        and insert-only MIN/MAX candidates; retraction keys get their
        absolute min/max patched in by ``_merge_source``."""
        cdf = self.store.changes(self.source, applied, cur)
        w = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
        cdf = cdf.withColumn("__w", w)
        aggs: list[Column] = [F.sum("__w").cast("bigint").alias("n_rows")]
        for c in self.sum_cols:
            aggs.append(
                F.sum(F.coalesce(F.col(c), F.lit(0)) * F.col("__w"))
                .cast("bigint")
                .alias(f"sum_{c}")
            )
        for c in self.sum_cols:
            aggs.append(
                F.sum(F.when(F.col(c).isNotNull(), F.col("__w")).otherwise(0))
                .cast("bigint")
                .alias(f"__nn_{c}")
            )
        for c in self.minmax_cols:
            aggs.append(
                F.min(F.when(F.col("__w") > 0, F.col(c))).alias(f"min_{c}")
            )
        for c in self.minmax_cols:
            aggs.append(
                F.max(F.when(F.col("__w") > 0, F.col(c))).alias(f"max_{c}")
            )
        aggs.append(
            F.max(F.when(F.col("__w") < 0, 1).otherwise(0)).alias("__has_del")
        )
        return cdf.groupBy(*self.keys).agg(*aggs)

    def _merge_source(
        self, delta: DataFrame, cur: int, insert_only: bool = False
    ) -> DataFrame:
        """The frame the key-merge consumes. Without minmax columns (or
        with a delete-free delta) this IS the delta. With retractions
        present, the keys that saw a delete get absolute min/max
        recomputed from the source snapshot AT ``cur`` — pinned, not the
        live pointer, so a commit landing mid-refresh cannot leak rows
        beyond the version the watermark will record — via a broadcast
        semi-join of exactly those keys, so the re-aggregation cost
        tracks rows under CHURNED keys, never the table.

        ``insert_only=True`` asserts the caller PROVED the delta window
        delete-free from commit metadata (``store.window_insert_only``):
        the delta checkpoint + has-delete probe jobs are skipped
        entirely — on an append-only refresh they were pure fixed cost
        (r12, measured ~0.5 s of the refresh wall at sf0.1)."""
        if not self.minmax_cols:
            return delta
        if insert_only:
            return delta
        # Aggregate-sized: persist so the retraction probe + merge reuse
        # one CDF shuffle instead of recomputing the snapshot diff.
        delta = delta.localCheckpoint(eager=True)
        has_del = delta.agg(F.max("__has_del")).first()[0]
        if not has_del:
            return delta
        # NULL grouping keys are one group (groupBy/CDF semantics), so
        # every key join here must be null-safe — a plain equi-join
        # would silently skip the NULL group's recompute and null out
        # its extremes while rows still exist
        del_keys = delta.filter(F.col("__has_del") == 1).select(
            *[F.col(k).alias(f"__dk_{k}") for k in self.keys]
        )
        absolute = (
            self.store.read(self.source, cur)
            .join(F.broadcast(del_keys), null_safe_on(self.keys, "__dk_"), "left_semi")
            .groupBy(*self.keys)
            .agg(
                *[F.min(F.col(c)).alias(f"__abs_min_{c}") for c in self.minmax_cols],
                *[F.max(F.col(c)).alias(f"__abs_max_{c}") for c in self.minmax_cols],
            )
        )
        absolute = absolute.select(
            *[F.col(k).alias(f"__ak_{k}") for k in self.keys],
            *[F.col(f"__abs_min_{c}") for c in self.minmax_cols],
            *[F.col(f"__abs_max_{c}") for c in self.minmax_cols],
        )
        patched = delta.join(
            F.broadcast(absolute), null_safe_on(self.keys, "__ak_"), "left"
        )
        for c in self.minmax_cols:
            patched = patched.withColumn(
                f"min_{c}",
                F.when(F.col("__has_del") == 1, F.col(f"__abs_min_{c}")).otherwise(
                    F.col(f"min_{c}")
                ),
            ).withColumn(
                f"max_{c}",
                F.when(F.col("__has_del") == 1, F.col(f"__abs_max_{c}")).otherwise(
                    F.col(f"max_{c}")
                ),
            )
        return patched.drop(
            *[f"__abs_min_{c}" for c in self.minmax_cols],
            *[f"__abs_max_{c}" for c in self.minmax_cols],
            *[f"__ak_{k}" for k in self.keys],
        )

    def _matched_assignments(self) -> dict[str, Column]:
        """WHEN MATCHED SET expressions. Sums/counts coalesce both sides
        to 0 (the r6 advisor finding: a delta key whose changed rows all
        carry NULL in a sum column must not poison the running sum, and
        an old NULL must not poison a real delta); min/max take the
        recomputed absolute when the key retracted, else fold with
        LEAST/GREATEST (null-skipping, like MIN/MAX themselves)."""
        sets: dict[str, Column] = {
            "n_rows": (F.col("n_rows") + F.col("__src_n_rows")).cast("bigint")
        }
        for c in self.sum_cols:
            for stored in (f"sum_{c}", f"__nn_{c}"):
                sets[stored] = (
                    F.coalesce(F.col(stored), F.lit(0))
                    + F.coalesce(F.col(f"__src_{stored}"), F.lit(0))
                ).cast("bigint")
        for c in self.minmax_cols:
            sets[f"min_{c}"] = F.when(
                F.col("__src___has_del") == 1, F.col(f"__src_min_{c}")
            ).otherwise(F.least(F.col(f"min_{c}"), F.col(f"__src_min_{c}")))
            sets[f"max_{c}"] = F.when(
                F.col("__src___has_del") == 1, F.col(f"__src_max_{c}")
            ).otherwise(F.greatest(F.col(f"max_{c}"), F.col(f"__src_max_{c}")))
        return sets

    # -- API -----------------------------------------------------------------

    def refresh(self) -> dict:
        """Bring the view up to the source's current version.

        First call = full build. Later calls read ONLY the CDF between
        the last applied version and current, aggregate the deltas
        signed (insert +1 / delete -1), and key-MERGE them into the
        view: matched keys add the delta to their running count/sums
        (min/max fold or recompute per ``_matched_assignments``), keys
        whose count reaches zero are deleted, unmatched delta keys
        insert. Returns a small stats dict (the logging breadcrumb a
        pipeline records per refresh)."""
        cur = self.store.current_version(self.source)
        applied = self._applied_version()
        meta = {"ivm_applied": cur}
        if applied is None:
            # read pinned at cur: a commit landing mid-build must not be
            # folded into a view whose watermark records only cur
            built = self._build_frame(self.store.read(self.source, cur))
            if self.store.current_version(self.name) >= 0:
                self.store.overwrite(self.name, built, meta=meta)
            else:
                self.store.create(self.name, built, meta=meta)
            return {"mode": "full", "source_version": cur}
        if applied == cur:
            return {"mode": "noop", "source_version": cur}
        if not self.store.has_version(self.source, applied):
            # the applied snapshot fell out of vacuum retention, so the
            # change feed from it can no longer be computed — the
            # standard CDF-unavailable treatment is a full rebuild (and
            # an EAGER probe keeps the failure mode a decision here, not
            # a file-not-found somewhere inside the merge job)
            self.store.overwrite(
                self.name,
                self._build_frame(self.store.read(self.source, cur)),
                meta=meta,
            )
            return {"mode": "rebuild", "from": applied, "to": cur}
        if not self.store.window_feeds_recorded(self.source, applied, cur):
            # Cost dispatch (r12, guide §1.2): a commit with unrecorded
            # provenance (merge/update/overwrite) forces the generic
            # change feed, which scans BOTH snapshots and shuffles their
            # union on every column before the fold even starts — while
            # a full rebuild scans ONE snapshot, aggregates on the view
            # key with map-side partials, and overwrites the
            # aggregate-sized view. The rebuild is a strict subset of
            # the diff's work at any scale, so the incremental path is
            # reserved for windows whose feeds are all recorded
            # (O(Σ|changes|) reads, the case IVM exists for). Measured
            # on the registered CDC churn at sf0.1: the merge-commit
            # refresh 2.4 s -> 0.6 s. Value-identity: the rebuild IS the
            # view invariant (view == full aggregate of the snapshot).
            self.store.overwrite(
                self.name,
                self._build_frame(self.store.read(self.source, cur)),
                meta=meta,
            )
            return {"mode": "rebuild", "from": applied, "to": cur}
        src = self._merge_source(
            self._delta_frame(applied, cur),
            cur,
            insert_only=self.store.window_insert_only(self.source, applied, cur),
        )
        src_cols = list(self._val_cols)
        if self.minmax_cols:
            src_cols.append("__has_del")
        self.store.merge(
            self.name,
            src,
            on=self.keys,
            source_cols=src_cols,
            when_matched_set=self._matched_assignments(),
            delete_matched_where=F.col("n_rows") == 0,
            insert_not_matched=True,
            meta=meta,
        )
        return {"mode": "incremental", "from": applied, "to": cur}

    def read(self) -> DataFrame:
        """The view with SQL aggregate semantics restored: a sum column
        whose key currently holds zero non-null values reads NULL (the
        internal 0-based running sum and its non-null count stay private
        to the store)."""
        raw = self.store.read(self.name)
        cols: list[Column] = [F.col(k) for k in self.keys] + [F.col("n_rows")]
        for c in self.sum_cols:
            cols.append(
                F.when(F.col(f"__nn_{c}") > 0, F.col(f"sum_{c}"))
                .otherwise(F.lit(None).cast("bigint"))
                .alias(f"sum_{c}")
            )
        for c in self.minmax_cols:
            cols.append(F.col(f"min_{c}"))
        for c in self.minmax_cols:
            cols.append(F.col(f"max_{c}"))
        return raw.select(*cols)

    def recompute(self) -> DataFrame:
        """The full-scan answer (test oracle / audit path) — plain SQL
        aggregates, same exposed columns as ``read()``."""
        aggs: list[Column] = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
        for c in self.sum_cols:
            aggs.append(F.sum(F.col(c)).cast("bigint").alias(f"sum_{c}"))
        for c in self.minmax_cols:
            aggs.append(F.min(F.col(c)).alias(f"min_{c}"))
        for c in self.minmax_cols:
            aggs.append(F.max(F.col(c)).alias(f"max_{c}"))
        return self.store.read(self.source).groupBy(*self.keys).agg(*aggs)


# -- registered demonstration query ------------------------------------------

# Per-session scratch store dirs: the IVM demo query needs a writable
# snapshot store; one temp dir per (applicationId, sf) so repeat calls
# in a session (bench reruns, FAIR streams) see the same store state.
_DEMO_STORE_DIRS: dict[tuple[str, str], str] = {}

# The churn script is resumable by store version but not naturally
# concurrent: two driver threads racing the same step would both pass
# the version guard and double-append (or trip OCC). Registered
# queries must be safe under a concurrent harness (bench's FAIR
# streams), so the whole script runs under one process lock — held for
# single-digit seconds on the first call per (session, sf), and only
# around a version probe + noop refresh afterwards.
import threading as _threading

_DEMO_LOCK = _threading.Lock()


def _demo_store(spark, sf: str) -> MetadataStore:
    import tempfile

    key = (spark.sparkContext.applicationId, sf)
    for stale in [k for k in _DEMO_STORE_DIRS if k[0] != key[0]]:
        del _DEMO_STORE_DIRS[stale]
    if key not in _DEMO_STORE_DIRS:
        _DEMO_STORE_DIRS[key] = tempfile.mkdtemp(prefix="geostore_ivm_demo_")
    return MetadataStore(spark, _DEMO_STORE_DIRS[key])


def _register_query() -> None:
    from pyspark.sql import DataFrame, SparkSession

    from geostore_spark.registry import register
    from geostore_spark.sources.tables import load_table

    @register(
        "x_storage_ivm_refresh",
        "Incrementally-maintained aggregate as a registered, "
        "oracle-checked query: a per-priority (count, exact cents sum, "
        "min/max order date) view over a snapshot-store orders table "
        "driven through deterministic churn — full build on the pre-1997 "
        "slice, an appended 1997 batch, then a retraction deleting "
        "everything before 1995-07 — with ONE incremental refresh per "
        "step. The final view must equal a plain GROUP BY over the "
        "surviving date range, which is exactly what the oracle "
        "computes from the raw table: identical rows prove the CDF "
        "delta fold (sums), the non-null bookkeeping, AND the min/max "
        "recompute-on-retract path (the delete drags every group's MIN "
        "date forward — a pure LEAST/GREATEST fold would keep the stale "
        "1992 minimum). Mirrors the reference's asset_summaries min/max "
        "datetime ranges (SURVEY §2 A4; reference "
        "tests/stac_generators.py:63-81). At 100 TB each refresh "
        "shuffles the CDF delta, never the table; the retraction "
        "re-aggregates only churned keys via a broadcast semi-join.",
        """SELECT o_orderpriority AS pr,
                  COUNT(*) AS n_rows,
                  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS sum_cents,
                  MIN(o_orderdate) AS min_odate,
                  MAX(o_orderdate) AS max_odate
           FROM orders
           WHERE o_orderdate >= TIMESTAMP '1995-07-01'
             AND o_orderdate < TIMESTAMP '1998-01-01'
           GROUP BY o_orderpriority
           ORDER BY pr""",
    )
    def q_ivm_refresh(spark: SparkSession, sf: str) -> DataFrame:
        from pyspark.sql import functions as F

        store = _demo_store(spark, sf)
        src = "orders_churn"
        orders = load_table(spark, "orders", sf).select(
            F.col("o_orderkey").alias("okey"),
            F.col("o_orderpriority").alias("pr"),
            quantize(F.col("o_totalprice"), 100).alias("cents"),
            F.col("o_orderdate").alias("odate"),
        )
        view = IncrementalAggView(
            store, src, ["pr"], ["cents"], minmax_cols=["odate"], name="v_churn"
        )
        # deterministic churn script, resumable by store version so
        # repeat calls (bench reruns, concurrent FAIR streams after the
        # sequential pass) converge on the same final state; the lock
        # makes the version guards race-free under a concurrent harness
        with _DEMO_LOCK:
            if store.current_version(src) < 0:
                store.create(
                    src, orders.filter(F.col("odate") < F.lit("1997-01-01"))
                )
                view.refresh()  # full build
            if store.current_version(src) == 0:
                store.append(
                    src,
                    orders.filter(
                        (F.col("odate") >= F.lit("1997-01-01"))
                        & (F.col("odate") < F.lit("1998-01-01"))
                    ),
                )
                view.refresh()  # insert-only incremental (LEAST/GREATEST fold)
            if store.current_version(src) == 1:
                store.delete_where(src, F.col("odate") < F.lit("1995-07-01"))
                view.refresh()  # retraction: min/max recompute per churned key
            view.refresh()  # provable noop when already converged
        return view.read().select(
            "pr",
            "n_rows",
            "sum_cents",
            F.col("min_odate"),
            F.col("max_odate"),
        ).orderBy("pr")


_register_query()
