"""Streaming materialized view: foreachBatch -> snapshot store -> IVM.

The reference's event tail keeps derived state current as imports land
(SQS -> catalog update, one message at a time, idempotent on replay —
``geostore/populate_catalog/task.py``). The analytics generalization:
a Structured Streaming sink that lands each microbatch in the snapshot
store and refreshes a materialized aggregate INCREMENTALLY from the
change feed — per batch, the refresh cost is the batch's rows, never
the table.

Exactly-once across retries/restarts: foreachBatch may replay a batch
id after a failure, so the sink records the last applied batch id in a
one-row store table and skips replays (the reference's idempotent
child-add, as a streaming progress ledger). The ledger write shares
the store's OCC discipline, so a torn run cannot double-apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geostore_spark.sources.ivm import IncrementalAggView
from geostore_spark.sources.store import MetadataStore


class IvmStreamSink:
    """``writeStream.foreachBatch(sink)`` target that maintains a store
    table plus an :class:`IncrementalAggView` over it."""

    def __init__(
        self, store: MetadataStore, source: str, view: IncrementalAggView
    ) -> None:
        self.store = store
        self.source = source
        self.view = view
        self._ledger = f"__ivm_progress_{view.name}"

    def _last_applied(self) -> int:
        try:
            [row] = self.store.read(self._ledger).collect()
            return int(row["batch_id"])
        except Exception:
            return -1

    def _record(self, batch_id: int) -> None:
        spark = self.store.spark
        row = spark.createDataFrame([(batch_id,)], "batch_id long")
        if self.store.current_version(self._ledger) < 0:
            self.store.create(self._ledger, row)
        else:
            self.store.overwrite(self._ledger, row)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= self._last_applied():
            return  # replayed batch after a failure/restart: already applied
        if self.store.current_version(self.source) < 0:
            self.store.create(self.source, batch_df)
        else:
            self.store.append(self.source, batch_df)
        self.view.refresh()
        self._record(batch_id)
