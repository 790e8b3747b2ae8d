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

from geostore_spark.sources.ivm import IncrementalAggView
from geostore_spark.sources.store import MetadataStore

_BATCH_KEY = "stream_batch_id"


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
        return int(self.store.commit_meta(self.source).get(_BATCH_KEY, -1))

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
