"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance_for_python(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's parallelism — but only
    when the input arrives from fewer files than cores.

    CPU-bound Arrow/Python passes (sketches, shingling, BLAS probes)
    parallelize per partition; a small parquet input often arrives as a
    single split, which would serialize the whole pass onto one core. On
    a production table the scan yields plenty of splits and this is a
    no-op — the shuffle only exists in the small-input regime, where it
    is cheap by definition.

    The probe is ``inputFiles()`` (a file listing off the resolved scan
    relation), NOT ``df.rdd.getNumPartitions()``: converting the plan to
    an RDD costs a full analysis + conversion pass per call, which adds
    driver latency to every Python-pass query and serializes concurrent
    FAIR-scheduler streams on the driver lock. Derived frames with no
    scan (``inputFiles() == []``, e.g. createDataFrame fixtures) are
    conservatively rebalanced — correct either way, cheap at that size.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= target:
        return df
    return df.repartition(target)
