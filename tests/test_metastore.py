"""Metastore-persistent storage layouts (r6 verdict item #7): with a
file-backed Derby metastore configured, a bucketed table written in one
session is visible to a SECOND session through the CATALOG — bucket
spec intact, no directory adoption — exactly how a persistent-metastore
cluster amortizes layout cost across sessions.

Each session runs in its own subprocess: one Spark JVM per process, and
Derby allows one connected process at a time, so in-process session
restarts can't exercise this path honestly (``newSession()`` shares the
SharedState/externalCatalog and would prove nothing).
"""

from __future__ import annotations

import subprocess
import sys

_WRITER = """
import sys
sys.path.insert(0, "/root/repo")
from geostore_spark.session import build_session
from geostore_spark.sources.bucketed import write_bucketed
from geostore_spark.sources.tables import load_table

spark = build_session(app_name="metastore-writer", persistent_catalog_dir={cat!r})
spark.sparkContext.setLogLevel("ERROR")
df = load_table(spark, "orders", "/root/testdata/sf0.001").select(
    "o_orderkey", "o_totalprice"
)
write_bucketed(df, "orders_meta_t", "o_orderkey", buckets=8)
print("WROTE", spark.table("orders_meta_t").count())
spark.stop()
"""

_READER = """
import sys
sys.path.insert(0, "/root/repo")
from geostore_spark.session import build_session
from geostore_spark.sources.bucketed import adopt_existing_table, bucket_spec

adoptions = []
_orig = adopt_existing_table

def spy(*a, **kw):
    adoptions.append(a)
    return _orig(*a, **kw)

import geostore_spark.sources.bucketed as b
b.adopt_existing_table = spy

spark = build_session(app_name="metastore-reader", persistent_catalog_dir={cat!r})
spark.sparkContext.setLogLevel("ERROR")
assert spark.catalog.tableExists("orders_meta_t"), "catalog lost the table"
assert bucket_spec(spark, "orders_meta_t") == (8, "o_orderkey"), (
    "bucket spec not preserved: " + str(bucket_spec(spark, "orders_meta_t"))
)
assert not adoptions, "fell back to directory adoption"
n = spark.table("orders_meta_t").count()
print("READ", n)
spark.stop()
"""


def test_bucketed_table_survives_sessions_through_the_catalog(tmp_path):
    cat = str(tmp_path / "catalog")
    w = subprocess.run(
        [sys.executable, "-c", _WRITER.format(cat=cat)],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert w.returncode == 0, w.stderr[-2000:]
    n_written = int(w.stdout.strip().split()[-1])
    assert n_written > 0

    r = subprocess.run(
        [sys.executable, "-c", _READER.format(cat=cat)],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert int(r.stdout.strip().split()[-1]) == n_written


# -- cross-process snapshot-store writers (r10 verdict item 8) ---------------

_STORE_WRITER = """
import sys
sys.path.insert(0, "/root/repo")
from geostore_spark.session import build_session
from geostore_spark.sources.store import MetadataStore

spark = build_session(app_name="store-writer-child")
spark.sparkContext.setLogLevel("ERROR")
store = MetadataStore(spark, {root!r})
t = "datasets"
row = dict(dataset_id="child", title="from-child", created_at=None,
           updated_at=None, current_dataset_version="v0")
store.append(t, spark.createDataFrame([row], store.schema(t)),
             meta={{"writer": "child"}})
print("CHILD_COMMITTED", store.current_version(t))
spark.stop()
"""


def test_two_process_writers_conflict_and_retry(spark, tmp_path, monkeypatch):
    """Cross-PROCESS single-writer discipline (r10 verdict item 8): the
    reference's DynamoDB tables take concurrent writers from many
    Lambdas; the snapshot store's optimistic commit must hold across
    real process boundaries, not just two frames in one session.

    One subprocess writer session is launched from INSIDE the parent's
    commit window (the ``_crash_hook`` fault seam, after the parent has
    staged its snapshot but before the atomic rename). The child wins
    the version — the parent's rename then fails as a loud
    ConcurrentWriteError (never a silent lost update), and the parent's
    retry re-reads the child's committed rows and lands on top. The
    per-version ``_COMMIT.json`` metadata round-trips for BOTH writers
    across the process boundary."""
    import pytest

    from geostore_spark.sources.store import ConcurrentWriteError, MetadataStore

    root = str(tmp_path / "xstore")
    store = MetadataStore(spark, root)
    t = "datasets"
    mk = lambda ds: spark.createDataFrame(  # noqa: E731
        [dict(dataset_id=ds, title="t-" + ds, created_at=None,
              updated_at=None, current_dataset_version="v0")],
        store.schema(t),
    )
    store.append(t, mk("base"), meta={"writer": "parent-v0"})  # v0

    launched = []

    def hook(label):
        # child session commits BETWEEN the parent's stage and rename —
        # the interleaving a single process cannot honestly produce
        if label == "meta_written" and not launched:
            launched.append(True)
            r = subprocess.run(
                [sys.executable, "-c", _STORE_WRITER.format(root=root)],
                capture_output=True, text=True, timeout=300, cwd="/root/repo",
            )
            assert r.returncode == 0, r.stderr[-2000:]
            assert "CHILD_COMMITTED 1" in r.stdout

    monkeypatch.setattr(MetadataStore, "_crash_hook", staticmethod(hook))
    with pytest.raises(ConcurrentWriteError):
        store.append(t, mk("parent"), meta={"writer": "parent-v1"})

    # the child's commit is adopted by re-reading the shared root —
    # no parent-side cache to invalidate, v1 is the child's
    assert store.current_version(t) == 1
    assert store.commit_meta(t, 1) == {"writer": "child"}
    ids = {r["dataset_id"] for r in store.read(t).collect()}
    assert ids == {"base", "child"}

    # retry on the fresh base succeeds and carries the child's rows
    store.append(t, mk("parent"), meta={"writer": "parent-retry"})
    assert store.current_version(t) == 2
    assert store.commit_meta(t, 2) == {"writer": "parent-retry"}
    ids = {r["dataset_id"] for r in store.read(t).collect()}
    assert ids == {"base", "child", "parent"}
