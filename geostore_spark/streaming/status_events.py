"""Status-event streaming tail (ops S9, S10, T5-T7).

The reference's tail is event-driven AWS plumbing: EventBridge status
changes → SNS topic with message attributes (+ optional Slack with a
3000-char body cap, notify_status_update/task.py:63-141), and a FIFO SQS
queue with dedup ids feeding a single-concurrency catalog consumer
(infrastructure/constructs/processing.py:113-140).

Spark-first equivalents:

- source: Structured Streaming file source over the pipeline's status-event
  directory (S9). ``Trigger.AvailableNow`` drains everything durably and
  stops — the batch-friendly way to run an event tail, with checkpointed
  exactly-once progress replacing the queue's at-least-once + dedup-id.
- duplicate/replay safety (T7): ``withWatermark + dropDuplicates`` on the
  event id — the streaming twin of the FIFO MessageDeduplicationId window.
- sink (S10): ``foreachBatch`` invoking a notification handler per row with
  {dataset_title, status} attributes and the 3000-char truncation (F10).
  foreachBatch runs serially per micro-batch → the single-writer catalog
  discipline (T5) comes from the execution model, not a queue.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id string, dataset_id string, version_id string, title string, "
    "status string, validation_success boolean, ts timestamp"
)

SLACK_CHAR_LIMIT = 3000  # notify_status_update/task.py:137-141


def emit_status_event(events_dir: str, event: dict) -> str:
    """Producer side (S9): one immutable JSON file per event; the event id
    doubles as the dedup id (update_root_catalog/task.py:97)."""
    os.makedirs(events_dir, exist_ok=True)
    payload = dict(event)
    if isinstance(payload.get("ts"), datetime):
        payload["ts"] = payload["ts"].isoformat()
    path = os.path.join(events_dir, f"{payload['event_id']}.json")
    with open(path, "w") as f:
        json.dump(payload, f)
    return path


def status_event_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """Streaming source with replay-safe dedup (T7): 1-hour watermark on
    event time bounds the dedup state like the FIFO queue's window."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .json(events_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
    )


def format_notification(row) -> dict:
    """SNS-message shape: attributes for subscriber-side filtering (T6)
    plus a truncated human-readable body (F10)."""
    body = json.dumps(
        {
            "dataset_id": row["dataset_id"],
            "version_id": row["version_id"],
            "status": row["status"],
            "validation_success": row["validation_success"],
        }
    )
    return {
        "attributes": {"dataset_title": row["title"], "status": row["status"]},
        "body": body[:SLACK_CHAR_LIMIT],
    }


def run_notification_sink(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    handler: Callable[[dict], None],
) -> None:
    """Drain all pending events through ``handler`` exactly once
    (AvailableNow + checkpoint), ordered within each micro-batch."""

    def deliver(batch_df: DataFrame, _batch_id: int) -> None:
        # foreachBatch executes serially → single-writer discipline (T5)
        for row in batch_df.orderBy("ts", "event_id").collect():
            handler(format_notification(row))

    query = (
        status_event_stream(spark, events_dir)
        .writeStream.foreachBatch(deliver)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
