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
# prefix (~50) of the enumerated queries. The keys below enumerate
# FIRST this round (round 12), in priority order:
#   1. every query whose PLAN (or underlying commit protocol / layout
#      machinery) changed in round 12;
#   2. the round-11 rewrites that missed round 11's 50-key driver
#      sample (r11 verdict item 5 + advisor): the split-limb /
#      quantize-signed accumulator conversions, the lazy-chain kcore /
#      bfs rework, and the quantize-sweep consumers that overflowed the
#      r11 prefix — each gets its first post-rewrite ground-truth
#      oracle row this round.
# Everything else (driver-green r1 ∪ ... ∪ r11 — all 220 keys)
# enumerates last. Purely an enumeration-order hint — every query stays
# registered and locally oracle-tested either way.
_NEVER_DRIVER_SAMPLED = (
    # -- 1: plans / protocols changed in round 12 (triangles CSR kernel;
    #       kcore/bfs local kernels; IVM rebuild dispatch + multi-commit
    #       feed union; layout-write itemization; Arrow local-row tables
    #       in token_budget / mix_rebalance)
    "x_graph_triangles", "x_graph_kcore", "x_graph_bfs_layers",
    "x_storage_cdc_apply", "x_storage_ivm_refresh",
    "x_storage_bucketed_join", "x_storage_partition_prune",
    "x_sample_token_budget", "x_pipeline_mix_rebalance",
    "x_pipeline_training_set", "x_orders_backlog",
    # -- 2a: r11 rewrites with no r11 driver row (changed accumulators /
    #        plan shapes: limb sums, quantize_signed, lazy peel chains)
    "x_stats_zscore", "x_stats_profile", "x_stats_winsorize",
    "x_stats_gini", "x_stats_skew_kurtosis", "x_win_ntile_quartiles",
    "x_emb_gram", "x_emb_fisher_ratio",
    # -- 2b: r11 quantize-sweep consumers that overflowed the r11 prefix
    "x_orders_rfm", "x_part_abc_pareto", "x_stats_corr", "x_stats_hhi",
    "x_stats_bootstrap_ci", "x_stats_mann_whitney", "x_win_pct_change",
    "x_orders_active_intervals", "x_join_bloom_semi", "x_win_first_last",
    "x_mm_wav_windows", "x_mm_bmp_histogram", "x_mm_png_decode",
    # -- 3: r11-changed plans that DID get an r11 row — re-rowed last
    #       (lowest risk, kept inside the prefix for two-round coverage)
    "a9_quantiles", "x_stats_cov_matrix", "x_orders_repeat_rate",
    "x_events_cohort_ltv", "x_stats_chi2", "x_stats_mutual_info",
    "x_text_js_divergence", "x_stats_benford", "x_events_entropy_rate",
    "x_text_tfidf", "x_text_bm25", "x_text_repetition", "x_text_entropy",
    "x_text_kneser_ney", "x_text_bigram_lm", "x_text_trigram_novelty",
    "x_dedup_simhash_eval", "x_text_decontaminate",
)


def all_queries() -> dict[str, RegisteredQuery]:
    """Import every contributing module, then return the registry.

    Enumeration order: the round-12 priority prefix first (see
    _NEVER_DRIVER_SAMPLED — this round's changed plans/protocols, then
    the round-11 rewrites still awaiting a driver row), then any new
    queries added this round, then the 220 keys the driver already
    verified green in rounds 1-11.
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
    from geostore_spark.sources import bucketed, ivm, partitioned  # noqa: F401
    from geostore_spark.streaming import ivm_sink  # noqa: F401

    never = [k for k in _NEVER_DRIVER_SAMPLED if k in REGISTRY]
    never_set = set(never)
    # New queries added this round: no driver row yet either — right after.
    fresh = [k for k in REGISTRY if k not in never_set and k not in _DRIVER_VERIFIED]
    tail = [k for k in REGISTRY if k in _DRIVER_VERIFIED and k not in never_set]
    return {k: REGISTRY[k] for k in (*never, *fresh, *tail)}


# 220 keys with a green hash row in CORRECTNESS_r01 ∪ ... ∪ r09
# (every registered key — 100% ever-driver-verified; the r9 front
# list came back 50/50 green, so the union is unchanged).
_DRIVER_VERIFIED = frozenset((
    "a10_pivot_crosstab", "a1_filtered_count", "a2_existence_aggregate",
    "a3_group_collect_extrema", "a4_minmax_summary", "a5_status_rollup",
    "a6_distinct_set", "a7_grouping_sets", "a8_approx_distinct",
    "a9_quantiles", "f10_truncate", "f11_title_case", "f1_key_decompose",
    "f2_basename", "f3_url_parse", "f4_key_format", "f5_timestamp_parts",
    "f6_hex_digest", "f7_hashing", "f8_json_field", "f9_href_rewrite",
    "j10_null_safe_join", "j1_semi_join_exists", "j2_anti_join_not_exists",
    "j3_broadcast_lookup", "j4_update_via_join", "j5_multiway_join",
    "j6_latest_version", "j7_topk_revenue", "j8_large_orders",
    "j9_above_avg_anti", "o1_limit_probe", "o2_topk", "o3_set_difference",
    "o4_union_discriminator", "o5_intersect", "o6_except_all",
    "p1_project_rename", "p2_null_flag_predicate", "p3_boolean_filter",
    "p4_compound_filter", "p5_isin_guard", "p6_regex_validation",
    "s1_prefix_scan", "s2_point_lookup", "s3_index_equality",
    "s4_range_prefix", "s5_json_source", "s7_csv_manifest",
    "s8_dual_location_fallback", "w1_enumeration", "w2_max_by",
    "w3_batch_windows", "x_asof_join", "x_dedup_chunks", "x_dedup_clusters",
    "x_dedup_containment", "x_dedup_embed_cosine", "x_dedup_exact",
    "x_dedup_incremental", "x_dedup_minhash_eval", "x_dedup_minhash_lsh",
    "x_dedup_ngram_jaccard", "x_dedup_paragraph", "x_dedup_semantic",
    "x_dedup_simhash", "x_dedup_simhash_eval", "x_dedup_simhash_pairs",
    "x_dedup_substring", "x_dedup_url", "x_emb_centroid_shift",
    "x_emb_dim_truncation", "x_emb_fisher_ratio", "x_emb_gram",
    "x_emb_outliers", "x_emb_quantize", "x_events_burstiness",
    "x_events_changepoint", "x_events_cohort_ltv", "x_events_dau_mau",
    "x_events_entropy_rate", "x_events_ewma", "x_events_funnel",
    "x_events_gapfill", "x_events_markov", "x_events_retention",
    "x_events_rolling_anomaly", "x_events_seasonality", "x_geo_density",
    "x_geo_extent_rollup", "x_geo_grid_join", "x_geo_hotspot", "x_geo_knn",
    "x_geo_zorder", "x_graph_assortativity", "x_graph_bfs_layers",
    "x_graph_degree_stats", "x_graph_jaccard_parts", "x_graph_kcore",
    "x_graph_pagerank", "x_graph_triangles", "x_join_bloom_semi",
    "x_join_full_outer", "x_ml_kmeans", "x_ml_silhouette", "x_mm_bmp_decode",
    "x_mm_bmp_histogram", "x_mm_decode", "x_mm_frames", "x_mm_png_decode",
    "x_mm_resize", "x_mm_wav_decode", "x_mm_wav_windows",
    "x_orders_active_intervals", "x_orders_backlog", "x_orders_basket_lift",
    "x_orders_repeat_rate", "x_orders_rfm", "x_orders_skyline",
    "x_orders_survival", "x_part_abc_pareto", "x_pipeline_dataset_card",
    "x_pipeline_filter_ablation", "x_pipeline_funnel",
    "x_pipeline_mix_rebalance", "x_pipeline_mix_temperature",
    "x_pipeline_pack_sequences", "x_pipeline_shard_assign",
    "x_pipeline_training_set", "x_posexplode_ordinality",
    "x_q6_discount_revenue", "x_range_join", "x_sample_stratified",
    "x_sample_token_budget", "x_sample_topk_hash", "x_sample_weighted",
    "x_shipping_lag", "x_sim_ann_lsh", "x_sim_ivf", "x_sim_ivfpq",
    "x_sim_label_purity", "x_sim_pq_adc", "x_sim_range_search",
    "x_sim_recall_eval", "x_sim_topk_bruteforce", "x_skew_distinct",
    "x_skew_salted_agg", "x_stats_approx_quantile_audit", "x_stats_autocorr",
    "x_stats_benford", "x_stats_bootstrap_ci", "x_stats_chi2",
    "x_stats_column_entropy", "x_stats_corr", "x_stats_cov_matrix",
    "x_stats_gini", "x_stats_hhi", "x_stats_histogram",
    "x_stats_kendall_tau", "x_stats_ks_test", "x_stats_linreg",
    "x_stats_mad_outliers", "x_stats_mann_kendall", "x_stats_mann_whitney",
    "x_stats_mutual_info", "x_stats_profile", "x_stats_psi_drift",
    "x_stats_qq_deciles", "x_stats_runs_test", "x_stats_skew_kurtosis",
    "x_stats_spearman", "x_stats_theil_sen", "x_stats_ttest",
    "x_stats_wilson_rank", "x_stats_winsorize", "x_stats_zscore",
    "x_storage_bucketed_join", "x_storage_cdc_apply",
    "x_storage_ivm_refresh", "x_storage_partition_prune", "x_text_bigram_lm",
    "x_text_bm25", "x_text_bpe_pairs", "x_text_c4_lines",
    "x_text_chunk_windows", "x_text_decontaminate", "x_text_entropy",
    "x_text_fingerprint", "x_text_fuzzy_join", "x_text_gopher_rules",
    "x_text_heaps", "x_text_heavy_hitters", "x_text_js_divergence",
    "x_text_kneser_ney", "x_text_lang_id", "x_text_perplexity",
    "x_text_pii_redact", "x_text_quality", "x_text_readability",
    "x_text_repetition", "x_text_template_fingerprint", "x_text_tfidf",
    "x_text_tokens", "x_text_trigram_novelty", "x_text_winnow",
    "x_text_zipf", "x_unpivot_melt", "x_win_attribution", "x_win_cume_dist",
    "x_win_dense_rank_topn", "x_win_event_gap", "x_win_first_last",
    "x_win_moving_avg", "x_win_ntile_quartiles", "x_win_pct_change",
    "x_win_ratio_to_report", "x_win_session", "x_win_sliding",
    "x_win_streaks", "x_win_tumbling",
))
