"""Clean scale-slope measurement: the same queries at two (or more) SF
fixtures, interleaved round-robin in ONE warm session, medians of
>=reps. Results materialize through toPandas() — the Arrow path every
real consumer and the driver's own compare take; collect()'s per-Row
Python tax measured 7+ s on a 400k-row result whose plan runs in 0.6 s — the protocol the heavy-tailed-host experience demands
(BASELINE.md: cross-process absolutes under concurrent load have been
seen 3-30x off; paired interleaving cancels drift).

    python tools/sf_slope_probe.py --sf-dirs /tmp/sf1,/tmp/sf3 \
        --queries x_graph_jaccard_parts,x_orders_active_intervals \
        --reps 3 > /tmp/slope.json
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dirs", default="/tmp/sf1,/tmp/sf3")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    sf_dirs = args.sf_dirs.split(",")
    queries = args.queries.split(",")

    from geostore_spark.registry import all_queries
    from geostore_spark.session import build_session

    spark = build_session(app_name="sf-slope-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    # warm: one untimed pass of everything (JIT, codegen cache, memory
    # pools, shared scaffolds) — first-run walls at sf3 have measured
    # 3-6x the steady state in the same process
    for q in queries:
        for d in sf_dirs:
            qs[q].spark(spark, d).toPandas()

    times: dict[str, dict[str, list[float]]] = {
        q: {d: [] for d in sf_dirs} for q in queries
    }
    import gc

    # reap the warmup pass's litter BEFORE the first timed rep — the
    # per-query reap below only runs after timed queries, and the
    # warmup's dead blocks otherwise stall rep-0 of whichever query
    # runs first (measured r10: triangles@sf1 rep-0 42-68 s against a
    # ~24 s median; steady with this reap)
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(0.3)

    for rep in range(args.reps):
        for q in queries:
            for d in sf_dirs:
                t0 = time.time()
                qs[q].spark(spark, d).toPandas()
                dt = round(time.time() - t0, 2)
                times[q][d].append(dt)
                print(f"rep{rep} {q} {d}: {dt}s", file=sys.stderr, flush=True)
                # reap the previous queries' dead checkpoint blocks /
                # broadcasts OUTSIDE the timed window, after EVERY
                # timed query (round 10; was per-rep): ContextCleaner
                # only unpersists them after a JVM GC processes its
                # weak refs, and when several heavy graph loops share
                # one rep the per-rep cadence still let one query's
                # litter stall the next mid-flight (measured r10:
                # kcore@sf1 26.7 s rep against a 7.4 s median with
                # pagerank+triangles in the same rep; no rep >2x median
                # with the per-query reap). Medians should measure the
                # PLAN, not the harness's accumulated litter — a real
                # session runs one query, not 15 back-to-back replans.
                gc.collect()
                spark.sparkContext._jvm.System.gc()
                # the ContextCleaner drains its reference queue
                # ASYNCHRONOUSLY after the GC returns — give it a beat
                # so the unpersists don't overlap the next timed query
                time.sleep(0.3)

    out = {}
    for q in queries:
        med = {d: round(statistics.median(ts), 2) for d, ts in times[q].items()}
        entry = {d: {"runs": times[q][d], "median": med[d]} for d in sf_dirs}
        if len(sf_dirs) == 2 and med[sf_dirs[0]] > 0:
            entry["slope"] = round(med[sf_dirs[1]] / med[sf_dirs[0]], 2)
        out[q] = entry
    print(json.dumps({"sf_dirs": sf_dirs, "results": out}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
