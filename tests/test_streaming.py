"""Streaming tail tests (S9/S10, T5-T7): availableNow drain, exactly-once
via checkpoint, watermark dedup, attribute formatting, 3000-char cap."""

from __future__ import annotations

import json
from datetime import datetime, timezone

from geostore_spark.streaming.status_events import (
    SLACK_CHAR_LIMIT,
    emit_status_event,
    format_notification,
    run_notification_sink,
)

TS = datetime(2026, 1, 2, 3, 4, 5, tzinfo=timezone.utc)


def _event(event_id: str, **over) -> dict:
    ev = {
        "event_id": event_id,
        "dataset_id": "d1",
        "version_id": "v1",
        "title": "Test_Dataset",
        "status": "Succeeded",
        "validation_success": True,
        "ts": TS,
    }
    ev.update(over)
    return ev


def test_notification_sink_drains_dedups_and_checkpoints(spark, tmp_path):
    events = str(tmp_path / "events")
    checkpoint = str(tmp_path / "ckpt")
    emit_status_event(events, _event("e1"))
    emit_status_event(events, _event("e2", validation_success=False))
    emit_status_event(events, _event("e2", validation_success=False))  # replay (T7)

    seen: list[dict] = []
    run_notification_sink(spark, events, checkpoint, seen.append)
    assert [n["attributes"]["dataset_title"] for n in seen] == ["Test_Dataset"] * 2
    assert len(seen) == 2  # duplicate event_id dropped

    # second drain with same checkpoint: nothing new → exactly-once (T5)
    run_notification_sink(spark, events, checkpoint, seen.append)
    assert len(seen) == 2

    # new event after checkpoint is picked up
    emit_status_event(events, _event("e3"))
    run_notification_sink(spark, events, checkpoint, seen.append)
    assert len(seen) == 3


def test_notification_format_attributes_and_truncation():
    row = _event("e9", title="T" * 50, status="Failed")
    note = format_notification(row)
    assert note["attributes"] == {"dataset_title": "T" * 50, "status": "Failed"}
    assert json.loads(note["body"])["status"] == "Failed"
    long_row = _event("e10", version_id="V" * 5000)
    assert len(format_notification(long_row)["body"]) == SLACK_CHAR_LIMIT


def test_pipeline_emits_consumable_status_event(spark, tmp_path):
    import random

    from geostore_spark.api.datasets import create_dataset
    from geostore_spark.pipeline.ingest import create_dataset_version
    from geostore_spark.sources.store import MetadataStore

    from .stac_fixtures import build_golden_tree

    store = MetadataStore(spark, str(tmp_path / "store"))
    ds = create_dataset(store, "Stream_DS", now=TS, rng=random.Random(5))
    tree = build_golden_tree(str(tmp_path))
    create_dataset_version(
        spark, store, ds["body"]["id"], tree["root_url"], str(tmp_path / "storage"),
        now=TS, rng=random.Random(6),
    )
    seen: list[dict] = []
    run_notification_sink(
        spark, f"{store.root}/events", str(tmp_path / "ckpt"), seen.append
    )
    assert len(seen) == 1
    assert seen[0]["attributes"] == {"dataset_title": "Stream_DS", "status": "Succeeded"}
