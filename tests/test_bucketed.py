"""Bucketed co-located join: the one-time-shuffle / zero-shuffle-join
contract. The SMB join over two tables bucketed and sorted on the join
key must plan with no Exchange and no Sort below the join, and its
result must match the plain (shuffled) join exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from geostore_spark.sources.bucketed import cobucketed_revenue_join
from geostore_spark.sources.tables import load_table

from .conftest import SF_DIR


def test_cobucketed_join_is_shuffle_and_sort_free(spark):
    df = cobucketed_revenue_join(spark, SF_DIR, suffix="t1")
    got = [r.asDict() for r in df.collect()]  # execute: AQE final plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # no exchange may feed the join keys (the post-join aggregate's
    # priority-keyed exchange over 5 groups is fine)
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    # bucket-sorted scans: no per-partition sort below the join either
    join_part = plan[plan.index("SortMergeJoin"):]
    scans = [ln for ln in join_part.splitlines() if "FileScan" in ln]
    assert len(scans) >= 2
    assert plan.count("Bucketed: true") >= 2  # AQE prints initial+final

    # result equality with the plain shuffled join
    o = load_table(spark, "orders", SF_DIR).select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, "lineitem", SF_DIR).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    ref = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100,
                    0,
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("revenue_cents"),
        )
        .orderBy("o_orderpriority")
    )
    assert got == [r.asDict() for r in ref.collect()]


def test_cobucketed_join_writes_only_if_absent(spark):
    """Repeat invocations must NOT re-pay the one-time bucketing
    shuffle: the bucketed tables are written on the first call per
    (SF, suffix) and re-used — verified by the tables' created
    timestamps staying identical across calls — while the answer stays
    the same (r5 verdict: write-in-query-path was the worst bench row)."""
    from geostore_spark.sources.bucketed import bucket_spec
    from geostore_spark.sources.tables import fixture_tag

    first = [r.asDict() for r in cobucketed_revenue_join(spark, SF_DIR, suffix="t2").collect()]
    tag = fixture_tag(SF_DIR, ("orders", "lineitem"))
    tables = (f"orders_b_t2_{tag}", f"lineitem_b_t2_{tag}")

    def created_times():
        out = {}
        for t in tables:
            rows = spark.sql(f"DESCRIBE FORMATTED {t}").collect()
            out[t] = next(
                r["data_type"] for r in rows if r["col_name"].strip() == "Created Time"
            )
        return out

    assert bucket_spec(spark, tables[0]) == (16, "o_orderkey")
    assert bucket_spec(spark, tables[1]) == (16, "l_orderkey")
    t0 = created_times()
    second = [r.asDict() for r in cobucketed_revenue_join(spark, SF_DIR, suffix="t2").collect()]
    assert created_times() == t0  # no rewrite on the repeat call
    assert second == first

    # a missing/unbucketed table fails the probe and triggers the write
    assert bucket_spec(spark, "no_such_table_xyz") is None


def test_bucketed_tables_adopted_across_catalog_loss(spark, tmp_path):
    """A fresh session's in-memory catalog forgets the table while the
    bucketed parquet files survive in the warehouse: the probe must
    ADOPT the existing directory (external CREATE TABLE over it) and
    never re-pay the layout shuffle — the amortization must hold
    across sessions, not just calls."""
    import os
    import shutil

    from geostore_spark.sources.bucketed import (
        _default_table_path,
        bucket_spec,
    )
    from geostore_spark.sources.tables import fixture_tag

    first = [r.asDict() for r in cobucketed_revenue_join(spark, SF_DIR, suffix="t3").collect()]
    tag = fixture_tag(SF_DIR, ("orders", "lineitem"))
    tables = (f"orders_b_t3_{tag}", f"lineitem_b_t3_{tag}")
    mtimes = {}
    for t in tables:
        p = _default_table_path(spark, t)
        # simulate the fresh-session state: catalog entry gone, files
        # intact (managed DROP deletes files, so back them up around it)
        shutil.copytree(p, str(tmp_path / t))
        spark.sql(f"DROP TABLE {t}")
        shutil.rmtree(p, ignore_errors=True)
        shutil.copytree(str(tmp_path / t), p)
        assert not spark.catalog.tableExists(t)
        mtimes[t] = sorted(
            os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p)
        )
    second = [r.asDict() for r in cobucketed_revenue_join(spark, SF_DIR, suffix="t3").collect()]
    assert second == first
    for t in tables:
        assert bucket_spec(spark, t) == (16, "o_orderkey" if "orders" in t else "l_orderkey")
        p = _default_table_path(spark, t)
        got = sorted(
            os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p)
        )
        assert got == mtimes[t]  # adopted, not rewritten


def test_partition_prune_scan_carries_partition_filter(spark):
    """The year filter must reach the scan as a PARTITION filter
    (directory elimination), not a data filter — at 100 TB the scan
    reads one year's directories, never the table."""
    from geostore_spark.registry import all_queries

    q = all_queries()["x_storage_partition_prune"]
    df = q.spark(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "o_year" in m.group(1)  # the year predicate prunes dirs
    # repeat invocation reuses the table (write-if-absent)
    from geostore_spark.sources.partitioned import (
        ensure_partitioned_orders,
        partition_cols,
    )

    t = ensure_partitioned_orders(spark, SF_DIR)
    assert partition_cols(spark, t) == ["o_year"]


def test_fixture_tag_changes_when_fixture_regenerated(tmp_path):
    """The r6 advisor finding: durable layouts were keyed on the SF
    directory PATH alone, so regenerating the fixture in place would
    silently serve the stale layout's rows. The tag now folds each
    table file's (size, mtime_ns) in: rewriting a file at the same
    path yields a different tag, so the stale table is never found."""
    import os
    import shutil

    from geostore_spark.sources.tables import fixture_tag

    src = "/root/testdata/sf0.001/orders.parquet"
    d = tmp_path / "sf"
    d.mkdir()
    shutil.copyfile(src, d / "orders.parquet")
    t1 = fixture_tag(str(d), ("orders",))
    os.utime(d / "orders.parquet", ns=(1, 1))  # regenerate-in-place stand-in
    t2 = fixture_tag(str(d), ("orders",))
    assert t1 != t2
    # unstatable paths still produce a stable path-keyed tag
    t3 = fixture_tag("s3://bucket/sf1", ("orders",))
    assert t3 == fixture_tag("s3://bucket/sf1", ("orders",))
    assert t3 != fixture_tag("s3://bucket/sf2", ("orders",))
