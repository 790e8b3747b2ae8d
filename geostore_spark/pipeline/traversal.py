"""Recursive STAC tree traversal (op V1) as iterative frontier joins.

Mirrors /root/reference/geostore/check_stac_metadata/utils.py:191-258:
start at the root metadata URL, follow ``links`` where rel ∈ {child, item},
resolve ``./``-relative hrefs against the parent directory (utils.py:59-67),
visit every URL exactly once (``traversed_urls``, utils.py:92,256-258), and
preserve *discovery order* (observable in the enumerated range keys,
utils.py:165-189).

Spark has no recursive CTE, so the driver runs a bounded BFS loop where each
iteration is a DataFrame job: read the frontier documents (distributed
wholetext read), parse + explode links JVM-side, resolve hrefs, drop
already-visited URLs, recurse. The reference's DFS *pre-order* is
reconstructed exactly by carrying the link-index path (array<int>) and
sorting lexicographically at the end — order falls out of a sort, not a
sequential walk, so the traversal itself stays parallel.

URL-list bookkeeping lives on the driver (as it must: enumerating input
paths for a read is driver work even at cluster scale), but document
reads, parsing and link explosion are executor-side. The frontier is
metadata — bounded by catalog size, not data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from geostore_spark.logging_keys import LOG_MESSAGE_TRAVERSAL_COMPLETE, log_event

MAX_ITERATIONS = 1000  # cycle-safety backstop; depth of a sane catalog ≪ this

DOC_SCHEMA = (
    "type string, id string, stac_version string, description string, "
    "title string, `linz:security_classification` string, "
    "links array<struct<href string, rel string>>, "
    "assets map<string, struct<href string, `file:checksum` string>>"
)

FOLLOW_RELS = ("child", "item")


def _normalize_url(col):
    # spark reads local paths as file:/ or file:/// URIs; keep plain paths
    return F.regexp_replace(col, "^file:(//)?", "")


def _resolve_href(parent_url, href):
    """Resolve href against the parent document's directory — absolute
    hrefs (path or scheme) pass through; ``./x`` and bare-relative resolve
    to ``dirname(parent)/x`` (reference utils.py:59-67)."""
    parent_dir = F.regexp_replace(parent_url, "/[^/]+$", "")
    child = F.regexp_replace(href, r"^\./", "")
    return F.when(
        href.startswith("/") | href.rlike("^[a-z][a-z0-9+.-]*://"), href
    ).otherwise(F.concat(parent_dir, F.lit("/"), child))


def read_documents(spark: SparkSession, urls: list[str]) -> DataFrame:
    """Distributed wholetext read + JVM-side JSON parse of metadata docs.
    Keeps the raw text alongside the parse — the duplicate-key check (V4)
    must see raw bytes, since any JSON parser silently keeps the last key.
    """
    raw = (
        spark.read.option("wholetext", "true")
        .text(urls)
        .select(
            _normalize_url(F.input_file_name()).alias("url"),
            F.col("value").alias("raw"),
        )
    )
    return raw.withColumn("doc", F.from_json("raw", DOC_SCHEMA))


def traverse(spark: SparkSession, root_url: str) -> DataFrame:
    """Return every reachable metadata document with its DFS pre-order:
    (url, raw, doc, path array<int>, discovery_ord int)."""
    visited: dict[str, None] = {}  # insertion-ordered traversed_urls
    frontier: list[tuple[str, list[int]]] = [(root_url, [])]
    collected: list[DataFrame] = []

    for _ in range(MAX_ITERATIONS):
        new: list[tuple[str, list[int]]] = []
        seen_this_round: set[str] = set()
        for u, p in frontier:  # frontier is path-sorted: first hit keeps the
            if u not in visited and u not in seen_this_round:  # least path
                new.append((u, p))
                seen_this_round.add(u)
        if not new:
            break
        for u, _p in new:
            visited[u] = None
        paths = spark.createDataFrame(
            [(u, p) for u, p in new], "url string, path array<int>"
        )
        docs = read_documents(spark, [u for u, _ in new]).join(paths, "url")
        collected.append(docs)

        links = (
            docs.select(
                "url",
                "path",
                F.posexplode_outer(F.col("doc.links")).alias("link_idx", "link"),
            )
            .filter(F.col("link.rel").isin(*FOLLOW_RELS))
            .select(
                _resolve_href(F.col("url"), F.col("link.href")).alias("child_url"),
                F.concat("path", F.array("link_idx")).alias("path"),
            )
        )
        # one row per *first* discovery of a URL (cycle-safe, keeps the
        # lexicographically-least path so ordering matches the reference DFS)
        frontier = [
            (r["child_url"], list(r["path"]))
            for r in links.sort("path").collect()
        ]

    log_event(
        LOG_MESSAGE_TRAVERSAL_COMPLETE,
        root_url=root_url,
        n_urls=len(visited),
        n_rounds=len(collected),
    )
    if not collected:
        return spark.createDataFrame([], "url string, raw string, path array<int>")
    out = collected[0]
    for df in collected[1:]:
        out = out.unionByName(df)
    w = F.row_number().over(Window.orderBy("path"))
    return out.withColumn("discovery_ord", w - 1)
