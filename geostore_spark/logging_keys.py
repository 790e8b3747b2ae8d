"""Structured logging contract.

Mirrors the reference's event-constant discipline
(``geostore/logging_keys.py`` plus the dedicated
``tests/test_*_logging.py`` suite): each pipeline stage emits ONE
structured event — a stable message constant and a machine-readable
``event`` dict — so operators alert on events and fields, never on
string parsing. Events are emitted DRIVER-side from completed stage
results (executor logs don't aggregate), which also keeps them exact:
the fields come from the same collected rows the pipeline persists.
"""

from __future__ import annotations

import logging
from typing import Any

LOGGER_NAME = "geostore_spark"
LOGGER = logging.getLogger(LOGGER_NAME)

LOG_MESSAGE_TRAVERSAL_COMPLETE = "Validation Traversal Complete"
LOG_MESSAGE_VALIDATION_CHECK_FAILURE = "Validation Check Failure"
LOG_MESSAGE_VALIDATION_COMPLETE = "Validation Complete"
LOG_MESSAGE_IMPORT_JOB_RESULT = "Import Job Result"
LOG_MESSAGE_PIPELINE_RUN_COMPLETE = "Pipeline Run Complete"
# Per-check-family rollup (reference: one logging test file per check
# module — checksum, STAC schema, summary): one event per (check) family
# per run with pass/fail counts, so operators alert on a family's
# failure count without parsing per-URL rows.
LOG_MESSAGE_CHECK_STAGE_COMPLETE = "Check Stage Complete"
# Operator strategy dispatch: emitted when a dedup/graph/ANN operator
# picks its physical strategy from runtime size (broadcast fusion vs
# shuffle joins, local vs distributed) — the "why did this job shuffle?"
# breadcrumb at 100 TB.
LOG_MESSAGE_STRATEGY_DISPATCH = "Operator Strategy Dispatch"
# Dataset-endpoint request/outcome events (reference: the Lambda
# entrypoints log their payload on entry — LOG_MESSAGE_LAMBDA_START in
# geostore/logging_keys.py, pinned by
# tests/test_dataset_versions_endpoint_logging.py::should_log_payload —
# and their failure path). One event at handler entry with the request
# params, one at exit with the status code.
LOG_MESSAGE_API_REQUEST = "API Request"
LOG_MESSAGE_API_RESPONSE = "API Response"
# Similarity/ANN probe rollup: one event per search with the
# candidate-generation statistics (cells/buckets probed, candidate
# fraction) — the breadcrumb that distinguishes "recall is low because
# nprobe is too small" from "the index is broken" in a 100 TB run.
LOG_MESSAGE_ANN_STAGE_COMPLETE = "ANN Stage Complete"


def log_event(message: str, **fields: Any) -> None:
    """Emit one structured event: stable message + ``record.event`` dict."""
    LOGGER.info(message, extra={"event": fields})
