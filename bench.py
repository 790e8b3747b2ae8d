"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Timing counts full execution (collect to driver) per query, after a warmup
query to amortize JVM/codegen startup out of the per-query numbers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from geostore_spark.session import build_session

    spark = build_session(app_name="geostore-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    # Warmup: run the flagship once to pay JVM + codegen startup, and one
    # trivial mapInPandas to spawn the reusable Python/Arrow workers so the
    # first pandas-UDF query isn't billed interpreter startup.
    qs["a5_status_rollup"](spark, sf_dir).collect()
    spark.range(64).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))).mapInPandas(
        lambda it: it, "id long"
    ).collect()

    timings: dict[str, float] = {}
    for name in sorted(qs):
        start = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.collect()
        timings[name] = round(time.perf_counter() - start, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "canonical_suite_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
