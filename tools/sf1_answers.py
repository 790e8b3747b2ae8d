"""sf1 ANSWERS-match evidence for the DuckDB-DNF heavy queries.

Round 5 proved the heavy five (clusters, grid join, kcore, triangles,
fuzzy join) finish at sf1 in Spark while DuckDB DNFs them at a
300 s/query budget — wall-time evidence only. This tool turns that
into correctness evidence (r5 verdict item #4): run each engine's side
separately (the DuckDB pass may take hours — that is the point), dump
the result frames, then compare with the same sorted-columns hash the
driver harness uses.

    python tools/sf1_answers.py --engine spark --sf-dir /tmp/sf1 --out /tmp/sf1_ans
    python tools/sf1_answers.py --engine duck  --sf-dir /tmp/sf1 --out /tmp/sf1_ans
    python tools/sf1_answers.py --compare --out /tmp/sf1_ans \
        > SF1_CORRECTNESS.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

HEAVY = [
    "x_dedup_clusters",
    "x_geo_grid_join",
    "x_graph_kcore",
    "x_graph_triangles",
    "x_text_fuzzy_join",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def run_spark(sf_dir: str, out: str, keys: list[str]) -> None:
    from geostore_spark.registry import all_queries
    from geostore_spark.session import build_session

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    os.makedirs(out, exist_ok=True)
    for k in keys:
        t0 = time.time()
        pdf = qs[k].spark(spark, sf_dir).toPandas()
        dt = time.time() - t0
        pdf.to_parquet(os.path.join(out, f"{k}.spark.parquet"))
        with open(os.path.join(out, f"{k}.spark.json"), "w") as f:
            json.dump({"rows": len(pdf), "sec": round(dt, 2)}, f)
        print(f"spark {k}: {len(pdf)} rows in {dt:.1f}s", flush=True)


def run_duck(sf_dir: str, out: str, keys: list[str]) -> None:
    import duckdb

    from geostore_spark.registry import all_queries

    qs = all_queries()
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # leave cores for the Spark side / CI sharing the host: this pass is
    # about ANSWERS, not time (duck_suite.py owns the timing story)
    con.execute(f"SET threads={os.environ.get('DUCK_THREADS', '8')}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    for k in keys:
        t0 = time.time()
        pdf = con.execute(qs[k].oracle).df()
        dt = time.time() - t0
        pdf.to_parquet(os.path.join(out, f"{k}.duck.parquet"))
        with open(os.path.join(out, f"{k}.duck.json"), "w") as f:
            json.dump({"rows": len(pdf), "sec": round(dt, 2)}, f)
        print(f"duck {k}: {len(pdf)} rows in {dt:.1f}s", flush=True)


def run_duck_clusters_lp(sf_dir: str, out: str, max_rounds: int = 200) -> None:
    """Finishable ``x_dedup_clusters`` oracle (round-7 verdict item #1).

    The registered oracle's recursive CTE enumerates label-bearing WALKS
    (``walk`` is UNION-deduped over (vertex, label) pairs reached along
    every path) — state that grows with path count, not vertex count; at
    sf1 it ran >3 h / 60 GB RSS twice and was killed both times.  This
    computes the SAME min-label fixpoint by bounded-round iterative label
    propagation over temp tables: O(rounds * |E|) per round, one GROUP BY
    each, converging in O(component diameter) rounds.  Identical edge
    definition (simhash bands, Hamming <= 3) and identical output shape,
    so ``--compare`` works unchanged against the dumped Spark side.
    """
    import duckdb

    from geostore_spark.operators.dedup import simhash_pairs_ctes

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads={os.environ.get('DUCK_THREADS', '8')}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    t0 = time.time()
    con.execute(
        f"""CREATE TEMP TABLE edges AS
        WITH {simhash_pairs_ctes()},
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.fp, b.fp)) <= 3
        )
        SELECT doc_a AS u, doc_b AS w FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs"""
    )
    n_edges = con.execute("SELECT count(*) FROM edges").fetchone()[0]
    print(f"duck-lp edges built: {n_edges} in {time.time()-t0:.1f}s", flush=True)
    con.execute(
        "CREATE TEMP TABLE labels AS "
        "SELECT u AS v, u AS label FROM (SELECT DISTINCT u FROM edges)"
    )
    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        con.execute(
            """CREATE TEMP TABLE labels_next AS
            SELECT v, MIN(label) AS label FROM (
              SELECT v, label FROM labels
              UNION ALL
              SELECT e.w AS v, l.label FROM labels l JOIN edges e ON e.u = l.v
            ) GROUP BY v"""
        )
        changed = con.execute(
            "SELECT count(*) FROM labels_next n JOIN labels l USING (v) "
            "WHERE n.label <> l.label"
        ).fetchone()[0]
        con.execute("DROP TABLE labels")
        con.execute("ALTER TABLE labels_next RENAME TO labels")
        print(f"duck-lp round {rounds}: {changed} changed "
              f"({time.time()-t0:.1f}s)", flush=True)
        if changed == 0:
            break
    if rounds >= max_rounds:
        raise RuntimeError(f"label propagation did not converge in {max_rounds} rounds")
    pdf = con.execute(
        """SELECT v AS doc_id, label AS cluster_id,
                  COUNT(*) OVER (PARTITION BY label) AS cluster_size,
                  v = label AS keep
           FROM labels
           ORDER BY cluster_id, doc_id"""
    ).df()
    dt = time.time() - t0
    k = "x_dedup_clusters"
    pdf.to_parquet(os.path.join(out, f"{k}.duck.parquet"))
    with open(os.path.join(out, f"{k}.duck.json"), "w") as f:
        json.dump({"rows": len(pdf), "sec": round(dt, 2), "lp_rounds": rounds}, f)
    print(f"duck-lp {k}: {len(pdf)} rows in {dt:.1f}s ({rounds} rounds)", flush=True)


def compare(out: str, keys: list[str]) -> dict:
    import pandas as pd

    from geostore_spark.testing import frames_match

    result = {}
    for k in keys:
        sp_p = os.path.join(out, f"{k}.spark.parquet")
        du_p = os.path.join(out, f"{k}.duck.parquet")
        if not (os.path.exists(sp_p) and os.path.exists(du_p)):
            result[k] = {"status": "missing_side"}
            continue
        sp, du = pd.read_parquet(sp_p), pd.read_parquet(du_p)
        ok, msg = frames_match(sp, du)
        meta = {}
        for side in ("spark", "duck"):
            with open(os.path.join(out, f"{k}.{side}.json")) as f:
                meta[side] = json.load(f)
        result[k] = {
            "status": "match" if ok else "MISMATCH",
            "detail": None if ok else msg,
            "rows": meta["spark"]["rows"],
            "spark_sec": meta["spark"]["sec"],
            "duck_sec": meta["duck"]["sec"],
        }
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", choices=["spark", "duck", "duck_lp"])
    ap.add_argument("--compare", action="store_true")
    ap.add_argument("--sf-dir", default="/tmp/sf1")
    ap.add_argument("--out", default="/tmp/sf1_ans")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    keys = args.only.split(",") if args.only else HEAVY
    if args.compare:
        print(json.dumps(compare(args.out, keys), indent=1))
    elif args.engine == "spark":
        run_spark(args.sf_dir, args.out, keys)
    elif args.engine == "duck":
        run_duck(args.sf_dir, args.out, keys)
    elif args.engine == "duck_lp":
        run_duck_clusters_lp(args.sf_dir, args.out)
    else:
        ap.error("need --engine or --compare")


if __name__ == "__main__":
    main()
