"""Shared query registry.

Every operator the engine claims — canonical SURVEY §2 queries and
north-star extensions — registers here as (key, doc, spark plan, oracle SQL).
``all_queries()`` imports the contributing modules and returns the full map;
``__spark_entry__`` exposes it to the driver.

Oracle SQL runs in DuckDB only, so it may use DuckDB dialect (UNNEST,
list functions) as long as the results match the Spark plan's.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    key: str
    doc: str
    spark: SparkQuery
    oracle: str | None  # None → non-SQL-expressible, driver does rows-only


REGISTRY: dict[str, RegisteredQuery] = {}


def register(key: str, doc: str, oracle: str | None):
    def wrap(fn: SparkQuery) -> SparkQuery:
        if key in REGISTRY:
            raise ValueError(f"duplicate query key: {key}")
        REGISTRY[key] = RegisteredQuery(key=key, doc=doc, spark=fn, oracle=oracle)
        return fn

    return wrap


# Driver-coverage rotation: the per-round correctness harness samples a
# prefix (~50) of the enumerated queries. The 40 keys below have hash-matched
# the local DuckDB oracle every session (tests/test_canonical.py) but have
# never appeared in any driver CORRECTNESS file across rounds 1-2, so they
# enumerate FIRST this round; everything the driver has already verified
# green (CORRECTNESS_r01 ∪ r02 — 91 keys) enumerates last. Purely an
# enumeration-order hint — every query stays registered and locally
# oracle-tested either way.
_NEVER_DRIVER_SAMPLED = (
    "a7_grouping_sets", "a8_approx_distinct", "a9_quantiles",
    "a10_pivot_crosstab", "f6_hex_digest", "f7_hashing", "f8_json_field",
    "f9_href_rewrite", "f10_truncate", "f11_title_case", "o6_except_all",
    "x_dedup_incremental", "x_dedup_semantic", "x_dedup_substring",
    "x_events_dau_mau", "x_geo_density", "x_graph_degree_stats",
    "x_pipeline_dataset_card", "x_pipeline_mix_rebalance",
    "x_pipeline_pack_sequences", "x_pipeline_training_set",
    "x_sim_range_search", "x_stats_benford", "x_stats_chi2", "x_stats_gini",
    "x_stats_mad_outliers", "x_stats_winsorize", "x_text_bm25",
    "x_text_c4_lines", "x_text_fuzzy_join", "x_text_gopher_rules",
    "x_text_heavy_hitters", "x_text_perplexity", "x_win_attribution",
    "x_win_dense_rank_topn", "x_win_event_gap", "x_win_ntile_quartiles",
    "x_win_session", "x_win_sliding", "x_win_tumbling",
)


def all_queries() -> dict[str, RegisteredQuery]:
    """Import every contributing module, then return the registry.

    Enumeration order: never-driver-sampled first (see
    _NEVER_DRIVER_SAMPLED), then any new queries added this round, then
    the 91 keys the driver already verified green in rounds 1-2.
    """
    # Imports are effectful: each module registers its queries on import.
    from geostore_spark.operators import (  # noqa: F401
        analytics,
        dedup,
        embeddings,
        graph,
        ml,
        multimodal,
        retention,
        runtime_filters,
        sampling,
        similarity,
        skew,
        spatial,
        stats,
        temporal,
        text,
        windows,
    )
    from geostore_spark.plans import canonical  # noqa: F401

    never = [k for k in _NEVER_DRIVER_SAMPLED if k in REGISTRY]
    never_set = set(never)
    # New queries added this round: no driver row yet either — right after.
    fresh = [k for k in REGISTRY if k not in never_set and k not in _DRIVER_VERIFIED_R1R2]
    tail = [k for k in REGISTRY if k in _DRIVER_VERIFIED_R1R2 and k not in never_set]
    return {k: REGISTRY[k] for k in (*never, *fresh, *tail)}


# 91 keys with a green row in CORRECTNESS_r01.json ∪ CORRECTNESS_r02.json
# (88 hash-matched + 3 rows-only-by-design that ran clean).
_DRIVER_VERIFIED_R1R2 = frozenset((
    "a1_filtered_count", "a2_existence_aggregate", "a3_group_collect_extrema",
    "a4_minmax_summary", "a5_status_rollup", "a6_distinct_set",
    "f1_key_decompose", "f2_basename", "f3_url_parse", "f4_key_format",
    "f5_timestamp_parts", "j1_semi_join_exists", "j2_anti_join_not_exists",
    "j3_broadcast_lookup", "j4_update_via_join", "j5_multiway_join",
    "j6_latest_version", "j7_topk_revenue", "j8_large_orders",
    "j9_above_avg_anti", "o1_limit_probe", "o2_topk", "o3_set_difference",
    "o4_union_discriminator", "o5_intersect", "p1_project_rename",
    "p2_null_flag_predicate", "p3_boolean_filter", "p4_compound_filter",
    "p5_isin_guard", "p6_regex_validation", "s1_prefix_scan",
    "s2_point_lookup", "s3_index_equality", "s4_range_prefix",
    "s5_json_source", "s7_csv_manifest", "s8_dual_location_fallback",
    "w1_enumeration", "w2_max_by", "w3_batch_windows", "x_asof_join",
    "x_dedup_chunks", "x_dedup_clusters", "x_dedup_containment",
    "x_dedup_embed_cosine", "x_dedup_exact", "x_dedup_minhash_lsh",
    "x_dedup_ngram_jaccard", "x_dedup_simhash", "x_dedup_simhash_pairs",
    "x_dedup_url", "x_emb_quantize", "x_events_funnel", "x_events_retention",
    "x_geo_extent_rollup", "x_geo_grid_join", "x_geo_knn", "x_geo_zorder",
    "x_graph_pagerank", "x_ml_kmeans", "x_mm_decode", "x_mm_frames",
    "x_mm_resize", "x_range_join", "x_sample_stratified",
    "x_sample_token_budget", "x_sample_topk_hash", "x_sim_ann_lsh",
    "x_sim_ivf", "x_sim_ivfpq", "x_sim_pq_adc", "x_sim_topk_bruteforce",
    "x_skew_distinct", "x_skew_salted_agg", "x_stats_corr",
    "x_stats_histogram", "x_stats_profile", "x_stats_zscore",
    "x_text_bigram_lm", "x_text_decontaminate", "x_text_entropy",
    "x_text_fingerprint", "x_text_lang_id", "x_text_pii_redact",
    "x_text_quality", "x_text_repetition", "x_text_tfidf", "x_text_tokens",
    "x_text_winnow", "x_win_moving_avg",
))
