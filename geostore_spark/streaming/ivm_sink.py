"""Streaming materialized view: foreachBatch -> snapshot store -> IVM.

The reference's event tail keeps derived state current as imports land
(SQS -> catalog update, one message at a time, idempotent on replay —
``geostore/populate_catalog/task.py``). The analytics generalization:
a Structured Streaming sink that lands each microbatch in the snapshot
store and refreshes a materialized aggregate INCREMENTALLY from the
change feed — per batch, the refresh cost is the batch's rows, never
the table.

Exactly-once across retries/restarts: foreachBatch may replay a batch
id after a failure, so the sink commits the batch id ATOMICALLY with
the source append as transaction metadata on that same snapshot
commit (``store.commit_meta`` — Delta's ``txn`` shape; the r5 advisor
finding was precisely that a separate ledger commit leaves a window
where a torn run re-appends the batch). Replay then sees the batch id
on the source's latest commit and skips the append; the view refresh
runs unconditionally and is itself idempotent (its applied source
version rides the VIEW's commits the same way), so a crash anywhere
between append and refresh heals on the next delivery. The sink is
the source table's single writer — the store's documented discipline
(reference op T5) — which is what makes "latest commit's batch id"
the full replay history needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geostore_spark.operators.util import quantize
from geostore_spark.sources.ivm import IncrementalAggView
from geostore_spark.sources.store import MetadataStore

_BATCH_KEY = "stream_batch_id"
# message prefix the in-plan duplicate-key guard raises with; __call__
# matches on it to translate the Spark runtime error into the sink's
# documented ValueError
_DUP_KEY_MARKER = "CDC batch carries multiple events for key"


def _last_applied_batch(store: MetadataStore, table: str) -> int:
    """Highest ``stream_batch_id`` committed on any RETAINED snapshot.

    The latest commit alone is not enough: a metadata-less maintenance
    commit (an out-of-band ``compact()`` from code predating the
    carry-forward, a manual append) between a batch and a crash replay
    would reset the watermark to -1 and re-apply the replayed batch —
    value-idempotent for CdcStreamSink's merge but a DOUBLE APPEND for
    IvmStreamSink (r7 advisor). Scanning retained history is
    driver-side file metadata, O(retained versions), and compact() now
    also carries the meta forward so the watermark survives vacuum."""
    latest = int(store.commit_meta(table).get(_BATCH_KEY, -1))
    for h in store.history(table):
        latest = max(
            latest,
            int(store.commit_meta(table, h["version"]).get(_BATCH_KEY, -1)),
        )
    return latest


class IvmStreamSink:
    """``writeStream.foreachBatch(sink)`` target that maintains a store
    table plus an :class:`IncrementalAggView` over it."""

    def __init__(
        self, store: MetadataStore, source: str, view: IncrementalAggView
    ) -> None:
        self.store = store
        self.source = source
        self.view = view

    def _last_applied(self) -> int:
        return _last_applied_batch(self.store, self.source)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        meta = {_BATCH_KEY: batch_id}
        if batch_id > self._last_applied():
            if self.store.current_version(self.source) < 0:
                self.store.create(self.source, batch_df, meta=meta)
            else:
                self.store.append(self.source, batch_df, meta=meta)
        # unconditional: also catches up a torn run that crashed after
        # the append but before the refresh (refresh is a noop when the
        # view already reflects the source's current version)
        self.view.refresh()


class CdcStreamSink:
    """``writeStream.foreachBatch(sink)`` target for a CHANGE stream —
    upserts and deletes, not just appends.

    :class:`IvmStreamSink` models the reference's happy path (imports
    only ever ADD catalog entries), but the reference's API also
    mutates: datasets are deleted (``geostore/datasets/delete.py:27-64``)
    and retitled (``geostore/datasets/update.py``). A change-data stream
    of those events (the Debezium/CDC shape: primary key + row values +
    an ``op`` tag) cannot be folded by blind appends — it needs MERGE
    semantics. This sink applies each microbatch as ONE atomic
    key-merge commit on the snapshot store:

    * ``op = 'upsert'``, key present  -> matched row takes the source
      values (``WHEN MATCHED SET``),
    * ``op = 'upsert'``, key absent   -> row inserts,
    * ``op = 'delete'``, key present  -> matched row is dropped
      (``WHEN MATCHED ... DELETE``),
    * ``op = 'delete'``, key absent   -> ignored (idempotent replay of
      a delete, exactly like the reference returning 404 on a second
      DELETE without corrupting state).

    Because the store's change feed is a snapshot diff, the single
    merge commit surfaces to downstream IVM views as row-level
    insert/delete CDF rows — an upsert that changed values becomes
    delete(old)+insert(new), so a maintained MIN/MAX view exercises its
    recompute-on-retract path from a *stream* with no extra machinery.

    Exactly-once mirrors :class:`IvmStreamSink`: the batch id rides the
    merge commit's transaction metadata, so a replayed batch id is
    provably already applied and only the (idempotent) view refresh
    runs. Within a batch the latest event per key wins, ordered by
    ``seq_col`` when given (multi-event keys without a sequence column
    are rejected — silently picking one would be nondeterministic
    apply order, the exact bug CDC consumers must not have).

    At 100 TB: the merge probes the target by key join (broadcast-sized
    batch -> no target shuffle), the within-batch dedup shuffles only
    the batch, and the IVM refresh shuffles only the CDF delta — per
    microbatch, SHUFFLE/COMPUTE cost tracks the CHANGES, never the
    table. The snapshot commit itself rewrites the table's files (this
    store's documented trade — its tables are metadata-scale; a Delta
    target would rewrite only touched files, same merge plan).
    """

    def __init__(
        self,
        store: MetadataStore,
        table: str,
        pk: list[str],
        view: IncrementalAggView | None = None,
        op_col: str = "op",
        seq_col: str | None = None,
    ) -> None:
        self.store = store
        self.table = table
        self.pk = list(pk)
        self.view = view
        self.op_col = op_col
        self.seq_col = seq_col

    def _last_applied(self) -> int:
        return _last_applied_batch(self.store, self.table)

    def _latest_per_key(self, batch_df: DataFrame) -> DataFrame:
        """Collapse the batch to the last event per key. With a seq_col,
        max_by on it (one batch-sized shuffle); without one, any key
        carrying >1 event is an error — there is no order to resolve."""
        data_cols = [
            c for c in batch_df.columns if c not in (*self.pk, self.op_col)
        ]
        if self.seq_col is None:
            # in-plan guard (r7 watch item: the former pre-flight
            # groupBy/limit(1)/collect was an extra scheduled job on
            # EVERY no-seq batch): a per-key window count rides the op
            # column the merge consumes anyway, so a duplicate key
            # raises at execution inside the same action. One
            # batch-sized window shuffle replaces one whole job; the
            # runtime error is translated back to the documented
            # ValueError in __call__ (crash-wise this is safe — the
            # commit protocol stages before the atomic rename, so an
            # error mid-write leaves only inert scratch).
            from pyspark.sql import Window

            w = Window.partitionBy(*self.pk)
            msg = F.concat(
                F.lit(_DUP_KEY_MARKER + " ("),
                F.concat_ws(
                    ", ",
                    *[
                        F.coalesce(F.col(k).cast("string"), F.lit("NULL"))
                        for k in self.pk
                    ],
                ),
                F.lit(") but no seq_col was configured to order them"),
            )
            return batch_df.withColumn(
                self.op_col,
                F.when(
                    F.count(F.lit(1)).over(w) > 1, F.raise_error(msg)
                ).otherwise(F.col(self.op_col)),
            )
        others = [c for c in (*data_cols, self.op_col) if c != self.seq_col]
        return batch_df.groupBy(*self.pk).agg(
            *[
                F.max_by(F.col(c), F.col(self.seq_col)).alias(c)
                for c in others
            ],
            F.max(self.seq_col).alias(self.seq_col),
        )

    def _apply(self, events: DataFrame, meta: dict) -> None:
        # COUPLING (advisor note): the no-seq duplicate-key guard above
        # rides ``op_col`` and only fires if the merge plan actually
        # evaluates that expression for every row. Both arms below DO
        # consume op_col for every source row (the create path filters
        # on it; the merge's delete/insert arms read __src_<op_col>), and
        # tests/test_ivm_stream.py pins the end-to-end raise — if a
        # future change makes any branch read only pk columns, move the
        # guard onto a pk column the plan can never prune.
        data_cols = [
            c
            for c in events.columns
            if c not in (*self.pk, self.op_col, self.seq_col or "")
        ]
        if self.store.current_version(self.table) < 0:
            self.store.create(
                self.table,
                events.filter(F.col(self.op_col) != "delete").select(
                    *self.pk, *data_cols
                ),
                meta=meta,
            )
            return
        # deletes for absent keys must not materialize as rows: the
        # insert arm is gated on the op tag inside the merge plan itself
        # (WHEN NOT MATCHED AND op <> 'delete' THEN INSERT), so the
        # apply needs NO target scan beyond the merge's own key probe —
        # r7's separate target-key semi trim cost a third scan of the
        # target on EVERY batch, delete-free or not (reference parity:
        # the mutating endpoints stay O(touched keys),
        # /root/reference/geostore/datasets/delete.py:53-63)
        self.store.merge(
            self.table,
            events,
            on=self.pk,
            source_cols=[*data_cols, self.op_col],
            when_matched_set={c: F.col(f"__src_{c}") for c in data_cols},
            delete_matched_where=F.col(f"__src_{self.op_col}") == "delete",
            insert_not_matched=True,
            insert_not_matched_where=F.col(self.op_col) != "delete",
            meta=meta,
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id > self._last_applied():
            try:
                self._apply(
                    self._latest_per_key(batch_df), {_BATCH_KEY: batch_id}
                )
            except Exception as e:  # surface the in-plan guard cleanly
                if _DUP_KEY_MARKER in str(e):
                    raise ValueError(
                        "CDC batch carries multiple events for a key "
                        "but no seq_col was configured to order them: "
                        + str(e).split(_DUP_KEY_MARKER, 1)[1][:200]
                    ) from None
                raise
        if self.view is not None:
            # unconditional, same healing property as IvmStreamSink
            self.view.refresh()


# -- registered demonstration query ------------------------------------------


def _register_query() -> None:
    from pyspark.sql import SparkSession

    from geostore_spark.registry import register
    from geostore_spark.sources.ivm import _DEMO_LOCK, _demo_store
    from geostore_spark.sources.tables import load_table

    @register(
        "x_storage_cdc_apply",
        "Change-data-capture apply as a registered, oracle-checked "
        "query: a CDC event stream (upserts + deletes keyed by order "
        "key) drives a snapshot-store table through CdcStreamSink — "
        "batch 0 loads every pre-1996 order, batch 1 updates all "
        "1-URGENT orders (cents + 7) and deletes every 5-LOW order — "
        "while an attached IncrementalAggView maintains per-priority "
        "(count, cents sum, min/max cents) off the change feed. The "
        "final view must equal a plain GROUP BY over the mutated slice, "
        "which the oracle computes directly from raw orders: identical "
        "rows prove the one-commit merge apply (the whole-group delete "
        "drains 5-LOW's count to zero, which must REMOVE the view row, "
        "not zero it). Generalizes the reference's mutating API surface "
        "(dataset delete geostore/datasets/delete.py:27-64, title "
        "update geostore/datasets/update.py) from one-row endpoint "
        "calls to a batched change stream. At 100 TB the merge probes "
        "the target by key join; the refresh after a merge commit takes "
        "the r12 cost dispatch — merge records no change feed, so a "
        "one-scan view rebuild is strictly cheaper than the generic "
        "two-snapshot diff (recorded-feed windows, e.g. the append/"
        "delete churn in x_storage_ivm_refresh, keep the incremental "
        "O(|changes|) fold and the min/max recompute-on-retract).",
        """SELECT o_orderpriority AS pr,
                  COUNT(*) AS n_rows,
                  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)
                           + CASE WHEN o_orderpriority = '1-URGENT'
                                  THEN 7 ELSE 0 END) AS BIGINT)
                      AS sum_cents,
                  MIN(CAST(round(o_totalprice * 100) AS BIGINT)
                      + CASE WHEN o_orderpriority = '1-URGENT'
                             THEN 7 ELSE 0 END) AS min_cents,
                  MAX(CAST(round(o_totalprice * 100) AS BIGINT)
                      + CASE WHEN o_orderpriority = '1-URGENT'
                             THEN 7 ELSE 0 END) AS max_cents
           FROM orders
           WHERE o_orderdate < TIMESTAMP '1996-01-01'
             AND o_orderpriority <> '5-LOW'
           GROUP BY o_orderpriority
           ORDER BY pr""",
    )
    def q_cdc_apply(spark: SparkSession, sf: str) -> DataFrame:
        from geostore_spark.sources.ivm import IncrementalAggView

        store = _demo_store(spark, sf)
        src = "orders_cdc"
        slice_ = (
            load_table(spark, "orders", sf)
            .filter(F.col("o_orderdate") < F.lit("1996-01-01"))
            .select(
                F.col("o_orderkey").alias("okey"),
                F.col("o_orderpriority").alias("pr"),
                quantize(F.col("o_totalprice"), 100)
                .alias("cents"),
            )
        )
        view = IncrementalAggView(
            store, src, ["pr"], ["cents"], minmax_cols=["cents"], name="v_cdc"
        )
        # a constant seq: keys are unique per batch by construction, and
        # the seq path folds the per-key collapse into the merge plan
        # instead of paying the no-seq duplicate-check its own job
        sink = CdcStreamSink(store, src, pk=["okey"], view=view, seq_col="seq")
        # deterministic two-batch change script; the sink's batch-id
        # guard makes replays (bench reruns, concurrent FAIR streams)
        # provable no-ops, the shared lock makes the guards race-free
        with _DEMO_LOCK:
            sink(
                slice_.withColumn("op", F.lit("upsert")).withColumn(
                    "seq", F.lit(0).cast("bigint")
                ),
                batch_id=0,
            )
            updates = slice_.filter(F.col("pr") == "1-URGENT").select(
                "okey",
                "pr",
                (F.col("cents") + F.lit(7)).alias("cents"),
                F.lit("upsert").alias("op"),
                F.lit(0).cast("bigint").alias("seq"),
            )
            deletes = slice_.filter(F.col("pr") == "5-LOW").select(
                "okey",
                F.lit(None).cast("string").alias("pr"),
                F.lit(None).cast("bigint").alias("cents"),
                F.lit("delete").alias("op"),
                F.lit(0).cast("bigint").alias("seq"),
            )
            sink(updates.unionByName(deletes), batch_id=1)
        return view.read().orderBy("pr")


_register_query()
