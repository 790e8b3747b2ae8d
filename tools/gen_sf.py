"""Scale-factor fixture generator matching /root/testdata's shape.

The driver ships deterministic synthetic tables at sf0.001/0.01/0.1
(TESTDATA.md); BASELINE.md's crossover story ("Spark's throughput takes
over around sf 1-10") needs MEASURED evidence above sf0.1. This
generator reproduces the observed schema and distributions of the
driver tables (seed-deterministic, numpy-vectorized) at any sf, so
`bench.py` and the DuckDB oracle suite can run on an sf1-class fixture:

    python tools/gen_sf.py --sf 1 --out /tmp/sf1

Distribution notes (all read off the sf0.1 tables, see BASELINE.md):
- row counts scale linearly with sf (lineitem = 6M x sf, etc.); the
  events table keeps its fixed 30-day window and scales event DENSITY,
  so time-windowed rollups keep their semantics at every sf.
- orders.o_orderdate ~ uniform days in [1995-01-01, 2001-08-01];
  lineitem.l_shipdate is INDEPENDENT uniform over the same span +95d
  (observed mean orderdate->shipdate delta ~= +48d from the wider
  upper bound, range +-2400d).
- embeddings are unit-normalized N(0,1) 64-d float32 with uniform
  random labels (observed per-label centroid norms match chance).
- documents are word-soup over the same 31-word vocabulary, length
  uniform 10..100 words, lang ~ {en: .41, de/es/fr/zh: .1475}.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "F", "P"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["O", "F"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]

ORDER_EPOCH = np.datetime64("1995-01-01")
ORDER_DAYS = 2404  # .. 2001-08-01
SHIP_DAYS = 2499  # .. 2001-11-04 (independent of orderdate)
EVENT_EPOCH = np.datetime64("2024-01-01T00:00:00.000000")
EVENT_WINDOW_S = 30 * 24 * 3600  # fixed 30-day window at every sf


def _days_ts(rng: np.random.Generator, n: int, span: int) -> np.ndarray:
    return (ORDER_EPOCH + rng.integers(0, span, n).astype("timedelta64[D]")).astype(
        "datetime64[us]"
    )


def _write(out: Path, name: str, table: pa.Table) -> None:
    pq.write_table(table, out / f"{name}.parquet")
    print(f"{name}: {table.num_rows} rows")


def generate(sf: float, out: Path, tables: set[str] | None = None) -> None:
    """Write the fixture tables for scale factor ``sf`` under ``out``.

    ``tables`` restricts output to a subset (e.g. ``{"documents"}`` for
    the documents-side slope probes, where generating a 60M-row
    lineitem just to delete it would dominate the run). Every table
    block seeds its OWN ``np.random.default_rng(SEED + k)``, so a
    subset run produces byte-identical files to a full run.
    """

    def want(name: str) -> bool:
        return tables is None or name in tables

    out.mkdir(parents=True, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    if want("region"):
        _write(out, "region", pa.table({
            "r_regionkey": pa.array(range(5), pa.int32()),
            "r_name": REGIONS,
        }))
    if want("nation"):
        _write(out, "nation", pa.table({
            "n_nationkey": pa.array(range(25), pa.int32()),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
        }))

    if want("customer"):
        rng = np.random.default_rng(SEED)
        _write(out, "customer", pa.table({
            "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
            "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
            "c_mktsegment": pa.array(np.asarray(SEGMENTS)[rng.integers(0, 5, n_cust)]),
        }))

    if want("supplier"):
        rng = np.random.default_rng(SEED + 1)
        _write(out, "supplier", pa.table({
            "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
            "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
        }))

    if want("part"):
        rng = np.random.default_rng(SEED + 2)
        adj = np.asarray(ADJ)[rng.integers(0, len(ADJ), n_part)]
        noun = np.asarray(NOUN)[rng.integers(0, len(NOUN), n_part)]
        _write(out, "part", pa.table({
            "p_partkey": pa.array(np.arange(n_part), pa.int64()),
            "p_name": np.char.add(np.char.add(adj, " "), noun),
            "p_brand": pa.array(
                [f"Brand#{b}" for b in rng.integers(1, 26, n_part)]
            ),
            "p_type": pa.array(np.asarray(PTYPES)[rng.integers(0, len(PTYPES), n_part)]),
            "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
            "p_retailprice": np.round(900.0 + (np.arange(n_part) % 1000) / 10.0, 2),
        }))

    if want("orders"):
        rng = np.random.default_rng(SEED + 3)
        _write(out, "orders", pa.table({
            "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
            "o_orderstatus": pa.array(np.asarray(STATUSES)[rng.integers(0, 3, n_ord)]),
            "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
            "o_orderdate": _days_ts(rng, n_ord, ORDER_DAYS),
            "o_orderpriority": pa.array(
                np.asarray(PRIORITIES)[rng.integers(0, 5, n_ord)]
            ),
        }))

    if want("lineitem"):
        rng = np.random.default_rng(SEED + 4)
        _write(out, "lineitem", pa.table({
            "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
            "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
            "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
            "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
            "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
            "l_returnflag": pa.array(np.asarray(RETURNFLAGS)[rng.integers(0, 3, n_li)]),
            "l_linestatus": pa.array(np.asarray(LINESTATUSES)[rng.integers(0, 2, n_li)]),
            "l_shipdate": (
                np.datetime64("1995-01-02")
                + rng.integers(0, SHIP_DAYS, n_li).astype("timedelta64[D]")
            ).astype("datetime64[us]"),
        }))

    if want("events"):
        rng = np.random.default_rng(SEED + 5)
        gaps = rng.exponential(EVENT_WINDOW_S / n_ev, n_ev)
        ts_us = (np.cumsum(gaps) * 1e6).astype(np.int64)
        _write(out, "events", pa.table({
            "event_id": pa.array(np.arange(n_ev), pa.int64()),
            "ts": EVENT_EPOCH + ts_us.astype("timedelta64[us]"),
            "user_id": pa.array(rng.integers(0, int(15_000 * sf), n_ev), pa.int64()),
            "event_type": pa.array(
                np.asarray(EVENT_TYPES)[rng.integers(0, 5, n_ev)]
            ),
            "value": np.round(rng.exponential(50.0, n_ev), 2),
            "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
        }))

    if want("documents"):
        rng = np.random.default_rng(SEED + 6)
        lengths = rng.integers(10, 101, n_doc)
        words = np.asarray(VOCAB)[rng.integers(0, len(VOCAB), int(lengths.sum()))]
        texts, off = [], 0
        for ln in lengths:
            texts.append(" ".join(words[off : off + ln]))
            off += ln
        _write(out, "documents", pa.table({
            "doc_id": pa.array(np.arange(n_doc), pa.int64()),
            "text": texts,
            "lang": pa.array(np.asarray(LANGS)[rng.choice(5, n_doc, p=LANG_P)]),
            "source": pa.array([f"src{s}" for s in rng.integers(0, 20, n_doc)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }))

    if want("embeddings"):
        rng = np.random.default_rng(SEED + 7)
        vecs = rng.standard_normal((n_emb, 64))
        vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
        _write(out, "embeddings", pa.table({
            "vec_id": pa.array(np.arange(n_emb), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
        }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", type=Path, required=True)
    ap.add_argument(
        "--tables", default=None,
        help="comma-separated subset (default: all); per-table seeding "
        "keeps subset output byte-identical to a full run",
    )
    a = ap.parse_args()
    generate(a.sf, a.out, set(a.tables.split(",")) if a.tables else None)
