"""Incremental view maintenance over the store's change feed: the
materialized per-key (count, exact sums) aggregate must equal the full
recompute after every kind of churn the CDF can express — inserts,
deletes, updates, multiplicity shifts — while each refresh reads only
the delta, and keys drained to zero disappear."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geostore_spark.sources.ivm import IncrementalAggView
from geostore_spark.sources.store import MetadataStore


@pytest.fixture()
def store(spark, tmp_path):
    return MetadataStore(spark, str(tmp_path / "store"))


def _rows(df):
    return sorted(
        tuple(r) for r in df.select("k", "n_rows", "sum_cents").collect()
    )


def test_ivm_matches_recompute_through_churn(spark, store):
    src = spark.createDataFrame(
        [("a", 100), ("a", 250), ("b", 40), ("c", 7), ("c", 7)],
        "k string, cents long",
    )
    store.create("facts", src)
    view = IncrementalAggView(store, "facts", ["k"], ["cents"])

    s = view.refresh()
    assert s["mode"] == "full"
    assert _rows(view.read()) == _rows(view.recompute())
    assert view.refresh()["mode"] == "noop"

    # churn 1: insert new key, delete a key entirely, update a value
    store.append("facts", spark.createDataFrame([("d", 9)], "k string, cents long"))
    store.delete_where("facts", F.col("k") == "b")
    store.update_where(
        "facts", (F.col("k") == "a") & (F.col("cents") == 100),
        {"cents": F.lit(150)},
    )
    s = view.refresh()
    assert s["mode"] == "incremental"
    got = _rows(view.read())
    assert got == _rows(view.recompute())
    assert ("b", 1, 40) not in got  # drained key dropped
    assert ("a", 2, 400) in got     # 150 + 250

    # churn 2: multiplicity shift — two identical (c, 7) rows become one
    cur = store.read("facts")
    dedup = cur.withColumn(
        "__rn",
        F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"])
            .Window.partitionBy("k", "cents")
            .orderBy(F.lit(1))
        ),
    ).filter((F.col("k") != "c") | (F.col("__rn") == 1)).drop("__rn")
    store.overwrite("facts", dedup)
    view.refresh()
    got = _rows(view.read())
    assert got == _rows(view.recompute())
    assert ("c", 1, 7) in got

    # the refresh wrote a NEW view snapshot (versioned like any table)
    assert store.current_version(view.name) >= 2
