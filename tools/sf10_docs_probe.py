"""sf10 documents-side probe for the honest-superlinear pair miners.

BASELINE.md's slope tables flag four queries whose cost is TRUE pair
density (grows ~quadratically in the synthetic word-soup corpus):
containment, simhash_pairs, ngram_jaccard, clusters. This probe turns
the 100 TB story for that family from extrapolation into measurement:

1. CANDIDATE CENSUS (cheap aggregates, exact): per fixture, the
   candidate volume each miner's index would generate — Σ C(|bucket|,2)
   over simhash (band, bval) buckets, Σ C(df_prefix, 2) over jaccard
   prefix postings, Σ prefix·full postings for containment — plus hub
   sizes. This is the quantity that grows superlinearly, measured
   directly without running the joins.
2. TIMED RUNS, interleaved medians in one warm session: each query
   UNCAPPED under a wall budget (a DNF at budget is evidence, same
   convention as tools/duck_suite.py) and CAPPED with the production
   candidate-density guards (simhash bucket_cap, ngram df_cap) that
   operators/dedup.py exposes. The capped rows are the stated policy:
   at 100 TB these miners run with density caps (plus wider simhash
   fingerprints); uncapped runs are output-volume-bound by nature.

Fixtures come from tools/gen_sf.py --tables documents:

    python tools/gen_sf.py --sf 10 --out /tmp/sf10docs --tables documents
    python tools/sf10_docs_probe.py --sf-dirs /tmp/sf3docs,/tmp/sf10docs \
        --reps 3 --budget 900 > /tmp/sf10_probe.json
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import threading
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

# Cap choices are corpus-aware: this synthetic corpus has a CLOSED
# 31-word vocabulary (31^3 trigram space, max_df 915 at sf10; every
# token's df grows ∝ N), so a cap must sit below the sf10 df scale to
# bind at all. On a real Heaps-law corpus the caps bind only the hub
# tail and recall loss is boilerplate-only; here they shed a growing
# fraction of ALL tokens — which is exactly the honest trade the probe
# quantifies (compute bound vs recall, both measured).
BUCKET_CAP = 2_000  # simhash: E|bucket| at 500 k docs/1024 buckets ≈ 2 k
DF_CAP = 500  # ngram index: posting-list cap (binds at sf10, not sf3)


def _census(spark, docs):
    """Exact candidate-volume aggregates for each miner's index."""
    from pyspark.sql import functions as F

    from geostore_spark.operators.dedup import (
        SIMHASH_BANDS,
        _df_ordered_docs_arr,
        simhash,
    )

    out = {}
    width = 32 // SIMHASH_BANDS
    fps = simhash(docs, "doc_id", "text").localCheckpoint(eager=False)
    bands = fps.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash32", b * width)
                        .bitwiseAND((1 << width) - 1)
                        .alias("bval"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).groupBy("bk.band", "bk.bval").agg(F.count(F.lit(1)).alias("n"))
    row = bands.agg(
        F.sum(F.expr("n * (n - 1) / 2")).alias("cand"),
        F.max("n").alias("max_bucket"),
        F.count(F.lit(1)).alias("buckets"),
    ).collect()[0]
    out["simhash"] = {
        "candidates": int(row["cand"]),
        "max_bucket": int(row["max_bucket"]),
        "buckets": int(row["buckets"]),
    }

    arr = _df_ordered_docs_arr(docs, "doc_id", "text")
    t = 0.8
    prefix = arr.select(
        F.explode(
            F.slice(
                F.col("hs"), 1, (F.col("n") - F.ceil(t * F.col("n")) + 1).cast("int")
            )
        ).alias("sh")
    ).groupBy("sh").agg(F.count(F.lit(1)).alias("p"))
    full = arr.select(F.explode("hs").alias("sh")).groupBy("sh").agg(
        F.count(F.lit(1)).alias("f")
    )
    row = (
        prefix.join(full, "sh")
        .agg(
            F.sum(F.expr("p * (p - 1) / 2")).alias("jac_cand"),
            F.sum(F.expr("p * f")).alias("cont_cand"),
            F.max("f").alias("max_df"),
        )
        .collect()[0]
    )
    out["ngram"] = {
        "jaccard_prefix_candidates": int(row["jac_cand"]),
        "containment_candidates": int(row["cont_cand"]),
        "max_df": int(row["max_df"]),
    }
    return out


def _variants(docs):
    """name -> zero-arg plan builder returning a DataFrame to count()."""
    from geostore_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
        simhash,
        simhash_pairs,
    )
    from geostore_spark.operators.graph import connected_components

    fps = simhash(docs, "doc_id", "text").localCheckpoint(eager=False)

    def clusters(cap):
        edges = simhash_pairs(fps, "doc_id", bucket_cap=cap).select(
            "doc_a", "doc_b"
        )
        return connected_components(edges, "doc_a", "doc_b")

    return {
        "containment_exact": lambda: ngram_containment_pairs(docs, "doc_id", "text"),
        "containment_capped": lambda: ngram_containment_pairs(
            docs, "doc_id", "text", df_cap=DF_CAP
        ),
        "jaccard_exact": lambda: ngram_jaccard_pairs(docs, "doc_id", "text"),
        "jaccard_capped": lambda: ngram_jaccard_pairs(
            docs, "doc_id", "text", df_cap=DF_CAP
        ),
        "simhash_pairs_exact": lambda: simhash_pairs(fps, "doc_id"),
        "simhash_pairs_capped": lambda: simhash_pairs(
            fps, "doc_id", bucket_cap=BUCKET_CAP
        ),
        "clusters_exact": lambda: clusters(None),
        "clusters_capped": lambda: clusters(BUCKET_CAP),
    }


def _timed(spark, build, budget):
    """Run build().count() under a wall budget; cancel + DNF past it."""
    done = threading.Event()
    fired = threading.Event()

    def watchdog():
        if not done.wait(budget):
            fired.set()
            spark.sparkContext.cancelJobGroup("probe")

    w = threading.Thread(target=watchdog, daemon=True)
    w.start()
    spark.sparkContext.setJobGroup("probe", "sf10 docs probe", True)
    t0 = time.time()
    try:
        n = build().count()
        return round(time.time() - t0, 1), int(n)
    except Exception as e:
        # only a watchdog cancellation is budget evidence ("DNF"); any
        # other failure (analysis error, OOM, bad fixture path) must be
        # recorded as an error, not mistaken for the output-volume wall
        if fired.is_set() or "cancelled" in repr(e).lower():
            return "DNF", None
        return {"error": repr(e)[:500]}, None
    finally:
        done.set()
        spark.sparkContext.setJobGroup("", "")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dirs", default="/tmp/sf3docs,/tmp/sf10docs")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--budget", type=float, default=900.0)
    ap.add_argument("--skip-exact", action="store_true")
    ap.add_argument("--census-only", action="store_true")
    ap.add_argument(
        "--only", default=None, help="substring filter on variant names"
    )
    ap.add_argument("--skip-census", action="store_true")
    args = ap.parse_args()
    sf_dirs = args.sf_dirs.split(",")

    from geostore_spark.session import build_session
    from geostore_spark.sources.tables import load_table

    spark = build_session(app_name="sf10-docs-probe")
    spark.sparkContext.setLogLevel("ERROR")

    result: dict = {"census": {}, "times": {}, "rows": {}, "dnf": []}
    if not args.skip_census:
        for d in sf_dirs:
            docs = load_table(spark, "documents", d)
            result["census"][d] = _census(spark, docs)
            print(f"census {d}: {result['census'][d]}", file=sys.stderr, flush=True)
    if args.census_only:
        print(json.dumps(result))
        return

    # timed: interleave variants round-robin across reps in ONE session;
    # a variant that DNFs once is not retried (budget already spent)
    times: dict[str, dict[str, list]] = {}
    dnf: set[tuple[str, str]] = set()
    for rep in range(args.reps):
        for d in sf_dirs:
            docs = load_table(spark, "documents", d)
            for name, build in _variants(docs).items():
                if args.skip_exact and name.endswith("_exact"):
                    continue
                if args.only and args.only not in name:
                    continue
                if (name, d) in dnf:
                    continue
                sec, n = _timed(spark, build, args.budget)
                times.setdefault(name, {}).setdefault(d, []).append(sec)
                if sec == "DNF":
                    dnf.add((name, d))
                    result["dnf"].append(f"{name}@{d}")
                else:
                    result["rows"][f"{name}@{d}"] = n
                print(f"rep{rep} {name} {d}: {sec}", file=sys.stderr, flush=True)
    for name, per in times.items():
        result["times"][name] = {
            d: (
                round(statistics.median(v), 1)
                if all(isinstance(x, float) for x in v)
                else "DNF"
            )
            for d, v in per.items()
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
