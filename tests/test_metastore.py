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
