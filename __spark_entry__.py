"""Driver contract for the geostore_spark engine.

``entry(spark)`` runs the flagship aggregate (SURVEY §2 op A5, the
TPC-H-Q1-shaped status rollup) on sf0.001. ``queries()`` exposes every
implemented operator from SURVEY.md §2 plus the north-star extensions;
``oracle_sql()`` gives the DuckDB-equivalent SQL for each (omitted only for
genuinely non-SQL-expressible ops, which the driver checks rows-only).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from geostore_spark.registry import all_queries  # noqa: E402

_ALL = all_queries()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _ALL["a5_status_rollup"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {key: q.spark for key, q in _ALL.items()}


def oracle_sql() -> dict[str, str]:
    return {key: q.oracle for key, q in _ALL.items() if q.oracle is not None}
