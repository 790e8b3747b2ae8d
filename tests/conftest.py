from __future__ import annotations

import os

import duckdb
import pytest

from geostore_spark.session import build_session

# Local canonical parity runs at the SAME scale factor as the driver's
# t2 correctness gate (sf0.01) — a plan that's only wrong at larger row
# counts (overflow, skew, sampling edges) must fail HERE, not in the
# driver. Override with SPARK_GRAFT_TEST_SF for a quick sf0.001 pass.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    session = build_session(app_name="geostore-spark-tests", shuffle_partitions=8)
    yield session
    session.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()
