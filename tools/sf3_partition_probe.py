"""Isolated sf3 shuffle-partition scaling probe (r6 verdict item #4).

Round 6 measured an AMBIGUOUS result for raising shuffle partitions
(jaccard 132->114 s but theil_sen regressed) — but that experiment
flipped the conf globally across SEPARATE processes on a noisy host.
This probe does it right: ONE session, variants interleaved
round-robin (so host drift hits both arms alike), conf scoped to the
query via set/reset around plan construction, medians of >=reps.

    python tools/sf3_partition_probe.py --sf-dir /tmp/sf3 --reps 3 \
        > /tmp/sf3_probe.json

On a real cluster `spark.sql.shuffle.partitions` scales with the
fleet; this probe answers whether the 11x jaccard sf3 slope is the
fixed-32-partitions local artifact BASELINE.md hypothesizes, and
whether a per-query bump would regress the flat queries that share
the same helpers.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

QUERIES = [
    "x_graph_jaccard_parts",
    "x_stats_theil_sen",
    "x_orders_active_intervals",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf3")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--hi", type=int, default=None, help="high partition count (default 8x cpus)")
    args = ap.parse_args()

    from geostore_spark.registry import all_queries
    from geostore_spark.session import build_session, get_cpus

    spark = build_session(app_name="sf3-partition-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    base = spark.conf.get("spark.sql.shuffle.partitions")
    hi = args.hi or 8 * get_cpus()
    variants = {"base": base, "hi": str(hi)}

    # warm the session + shared scaffolds once so every timed run is
    # steady-state (theil_sen rides the shared daily rollup)
    for q in QUERIES:
        qs[q].spark(spark, args.sf_dir).collect()

    times: dict[str, dict[str, list[float]]] = {
        q: {v: [] for v in variants} for q in QUERIES
    }
    for rep in range(args.reps):
        for q in QUERIES:
            for vname, vval in variants.items():
                spark.conf.set("spark.sql.shuffle.partitions", vval)
                spark.conf.set(
                    "spark.sql.adaptive.coalescePartitions.initialPartitionNum", vval
                )
                try:
                    t0 = time.time()
                    qs[q].spark(spark, args.sf_dir).collect()
                    dt = round(time.time() - t0, 2)
                finally:
                    spark.conf.set("spark.sql.shuffle.partitions", base)
                    spark.conf.set(
                        "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
                        base,
                    )
                times[q][vname].append(dt)
                print(
                    f"rep{rep} {q} {vname}({vval}p): {dt}s",
                    file=sys.stderr, flush=True,
                )

    out = {
        q: {
            v: {
                "runs": ts,
                "median": round(statistics.median(ts), 2),
            }
            for v, ts in by_v.items()
        }
        for q, by_v in times.items()
    }
    print(json.dumps({"sf_dir": args.sf_dir, "hi_partitions": hi, "results": out}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
