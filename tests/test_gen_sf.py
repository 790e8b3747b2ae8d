"""The sf-parameterized fixture generator behind the sf1 crossover
evidence (tools/gen_sf.py, BASELINE.md "Measured crossover at sf1"):
deterministic for a given sf, and schema-identical to the driver's
tables so bench/oracle runs on generated fixtures measure the same
workload shape."""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from gen_sf import generate  # noqa: E402

DRIVER_SF = Path("/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def test_generator_is_deterministic(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    generate(0.002, a)
    generate(0.002, b)
    for t in TABLES:
        assert (a / f"{t}.parquet").read_bytes() == (b / f"{t}.parquet").read_bytes(), t


def test_generated_schema_matches_driver_tables(tmp_path):
    out = tmp_path / "gen"
    generate(0.002, out)
    for t in TABLES:
        gen = pq.read_schema(out / f"{t}.parquet")
        drv = pq.read_schema(DRIVER_SF / f"{t}.parquet")
        for field in drv:
            g = gen.field(field.name)
            assert g is not None, f"{t}.{field.name} missing"
            assert g.type == field.type, f"{t}.{field.name}: {g.type} != {field.type}"


def test_generated_volumes_scale_linearly(tmp_path):
    out = tmp_path / "gen"
    generate(0.002, out)
    # 0.002/0.1 = 1/50 of the sf0.1 row counts
    assert pq.read_metadata(out / "lineitem.parquet").num_rows == 12_000
    assert pq.read_metadata(out / "orders.parquet").num_rows == 3_000
    assert pq.read_metadata(out / "documents.parquet").num_rows == 100
