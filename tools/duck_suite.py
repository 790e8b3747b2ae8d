"""DuckDB oracle-suite timer: the single-node comparison side of the
scale-evidence run (BASELINE.md crossover table).

Runs every registered oracle SQL against the parquet tables in --sf-dir
with a per-query wall-clock budget (duckdb's interrupt() from a watchdog
thread), printing one JSON line:

    {"sum_sec": ..., "queries": {name: sec | "DNF"}, "dnf": [...]}

A "DNF" is evidence, not an error: a query the single-node engine cannot
finish inside the budget at this sf is exactly the crossover point the
100 TB story is about.

    python tools/duck_suite.py --sf-dir /tmp/sf1 --timeout 600
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

import duckdb

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--timeout", type=float, default=600.0)
    ap.add_argument("--only", default=None, help="comma-separated keys")
    args = ap.parse_args()

    from geostore_spark.registry import all_queries

    qs = all_queries()
    keys = args.only.split(",") if args.only else sorted(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    timings: dict[str, float | str] = {}
    dnf: list[str] = []
    for key in keys:
        sql = qs[key].oracle
        if sql is None:
            continue
        timer = threading.Timer(args.timeout, con.interrupt)
        timer.start()
        start = time.perf_counter()
        try:
            con.execute(sql).fetchall()
            timings[key] = round(time.perf_counter() - start, 4)
        except duckdb.InterruptException:
            timings[key] = "DNF"
            dnf.append(key)
        except duckdb.Error as exc:  # interrupt can surface as generic Error
            if "INTERRUPT" in str(exc).upper():
                timings[key] = "DNF"
                dnf.append(key)
            else:
                timings[key] = f"ERR:{str(exc)[:120]}"
                dnf.append(key)
        finally:
            timer.cancel()
        print(f"{key}: {timings[key]}", file=sys.stderr, flush=True)

    total = round(sum(v for v in timings.values() if isinstance(v, float)), 2)
    print(json.dumps({
        "sum_sec": total,
        "timeout_sec": args.timeout,
        "n_queries": len(timings),
        "dnf": dnf,
        "queries": timings,
    }))


if __name__ == "__main__":
    main()
