"""Dump ``explain("formatted")`` for registered queries to text files.

Usage: python tools/dump_plans.py OUTDIR SUFFIX [SF_DIR] KEY [KEY ...]

Run from any checkout (repo root inferred from this file's location), so the
same script can dump "before" plans from a worktree pinned at an older commit
and "after" plans from HEAD. Writes ``OUTDIR/<key>_<SUFFIX>.txt``.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))


def main() -> None:
    outdir = Path(sys.argv[1])
    suffix = sys.argv[2]
    rest = sys.argv[3:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, keys = rest[0], rest[1:]
    else:
        sf_dir, keys = "/root/testdata/sf0.1", rest
    outdir.mkdir(parents=True, exist_ok=True)

    from geostore_spark.session import build_session

    spark = build_session(app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")

    from geostore_spark.registry import all_queries

    qs = all_queries()
    for key in keys:
        df = qs[key].spark(spark, sf_dir)
        text = spark._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
            df._jdf.queryExecution(), "formatted"
        )
        (outdir / f"{key}_{suffix}.txt").write_text(text)
        print(f"wrote {key}_{suffix}.txt ({len(text)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
