"""Shared query registry.

Every operator the engine claims — canonical SURVEY §2 queries and
north-star extensions — registers here as (key, doc, spark plan, oracle SQL).
``all_queries()`` imports the contributing modules and returns the full map;
``__spark_entry__`` exposes it to the driver.

Oracle SQL runs in DuckDB only, so it may use DuckDB dialect (UNNEST,
list functions) as long as the results match the Spark plan's.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    key: str
    doc: str
    spark: SparkQuery
    oracle: str | None  # None → non-SQL-expressible, driver does rows-only


REGISTRY: dict[str, RegisteredQuery] = {}


def register(key: str, doc: str, oracle: str | None):
    def wrap(fn: SparkQuery) -> SparkQuery:
        if key in REGISTRY:
            raise ValueError(f"duplicate query key: {key}")
        REGISTRY[key] = RegisteredQuery(key=key, doc=doc, spark=fn, oracle=oracle)
        return fn

    return wrap


def all_queries() -> dict[str, RegisteredQuery]:
    """Import every contributing module, then return the registry."""
    # Imports are effectful: each module registers its queries on import.
    from geostore_spark.operators import (  # noqa: F401
        dedup,
        embeddings,
        graph,
        ml,
        multimodal,
        retention,
        sampling,
        similarity,
        skew,
        spatial,
        stats,
        temporal,
        text,
        windows,
    )
    from geostore_spark.plans import canonical  # noqa: F401

    return dict(REGISTRY)
