"""ANN stage-event logging contract, in the reference's per-module
logging-test style (e.g.
/root/reference/tests/test_check_files_checksums_logging.py): every
similarity/ANN search emits one "ANN Stage Complete" event carrying the
candidate-generation statistics (queries, cells probed, codebook shape)
so recall-vs-cost questions are answerable from logs, not executor
spelunking."""

from __future__ import annotations

import logging

import pytest

from geostore_spark.logging_keys import (
    LOGGER_NAME,
    LOG_MESSAGE_ANN_STAGE_COMPLETE,
)
from geostore_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def logcap(caplog):
    caplog.set_level(logging.INFO, logger=LOGGER_NAME)
    return caplog


def _events(caplog):
    return [
        r.event
        for r in caplog.records
        if r.name == LOGGER_NAME and r.message == LOG_MESSAGE_ANN_STAGE_COMPLETE
    ]


def _emb(spark):
    return load_table(spark, "embeddings", SF)


def test_lsh_probe_event(spark, logcap):
    from pyspark.sql import functions as F

    from geostore_spark.operators.similarity import N_QUERIES, ann_lsh_topk

    emb = _emb(spark)
    ann_lsh_topk(emb, emb.filter(F.col("vec_id") < N_QUERIES))
    [ev] = [e for e in _events(logcap) if e["stage"] == "ann_lsh_probe"]
    assert ev["n_queries"] == N_QUERIES
    # single-probe LSH: one bucket per query
    assert ev["cells_probed_total"] == N_QUERIES
    assert 1 <= ev["cells_probed_distinct"] <= N_QUERIES


def test_ivf_probe_event_counts_nprobe_cells(spark, logcap):
    from pyspark.sql import functions as F

    from geostore_spark.operators.similarity import (
        N_QUERIES,
        NPROBE,
        NUM_CELLS,
        ivf_topk,
    )

    emb = _emb(spark)
    centroids = emb.filter(F.col("vec_id") < NUM_CELLS).select(
        F.col("vec_id").alias("cell_id"), "embedding"
    )
    ivf_topk(emb, centroids, emb.filter(F.col("vec_id") < N_QUERIES))
    [ev] = [e for e in _events(logcap) if e["stage"] == "ann_ivf_probe"]
    assert ev["cells_probed_total"] == N_QUERIES * NPROBE
    assert ev["cells_probed_distinct"] <= NUM_CELLS


def test_pq_and_bruteforce_and_range_events(spark, logcap):
    from pyspark.sql import functions as F

    from geostore_spark.operators.similarity import (
        N_QUERIES,
        PQ_K,
        PQ_M,
        RANGE_TAU,
        cosine_range_search,
        cosine_topk,
        pq_adc_topk,
    )

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    cosine_topk(emb, q)
    pq_adc_topk(emb, q)
    cosine_range_search(emb, q)
    stages = {e["stage"]: e for e in _events(logcap)}
    assert stages["ann_bruteforce"]["strategy"] == "full_scan_blas"
    assert stages["ann_pq_adc"]["pq_m"] == PQ_M
    assert stages["ann_pq_adc"]["pq_k"] == PQ_K
    assert stages["ann_range_search"]["tau"] == RANGE_TAU
    assert all(e["n_queries"] == N_QUERIES for e in stages.values())


def test_ivf_pq_event_has_both_axes(spark, logcap):
    from pyspark.sql import functions as F

    from geostore_spark.operators.similarity import (
        N_QUERIES,
        NPROBE,
        NUM_CELLS,
        ivf_pq_topk,
    )

    emb = _emb(spark)
    centroids = emb.filter(F.col("vec_id") < NUM_CELLS).select(
        F.col("vec_id").alias("cell_id"), "embedding"
    )
    ivf_pq_topk(emb, centroids, emb.filter(F.col("vec_id") < N_QUERIES))
    [ev] = [e for e in _events(logcap) if e["stage"] == "ann_ivf_pq"]
    # both ANN axes in one event: partition pruning + compression
    assert ev["n_cells"] == NUM_CELLS and ev["nprobe"] == NPROBE
    assert "pq_m" in ev and "pq_k" in ev
