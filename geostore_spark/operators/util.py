"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance_for_python(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's parallelism — but only
    when the input has fewer splits than cores.

    CPU-bound Arrow/Python passes (sketches, shingling, BLAS probes)
    parallelize per partition; a small parquet input often arrives as a
    single split, which would serialize the whole pass onto one core. On
    a production table the scan yields plenty of splits and this is a
    no-op — the shuffle only exists in the small-input regime, where it
    is cheap by definition.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
