"""Every canonical query (SURVEY §2) must hash-match the DuckDB oracle."""

from __future__ import annotations

import pytest

from geostore_spark.plans.canonical import CANONICAL_QUERIES
from geostore_spark.testing import frames_match

from .conftest import SF_DIR


@pytest.mark.parametrize("key", sorted(CANONICAL_QUERIES))
def test_canonical_matches_oracle(spark, duck, key):
    q = CANONICAL_QUERIES[key]
    assert q.oracle is not None, f"{key} has no oracle"
    spark_pdf = q.spark(spark, SF_DIR).toPandas()
    oracle_pdf = duck.execute(q.oracle).df()
    ok, msg = frames_match(spark_pdf, oracle_pdf)
    assert ok, f"{key}: {msg}"
