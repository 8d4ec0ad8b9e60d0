"""Query registry: the correctness contract surface.

Each engine operator from SURVEY.md §2B registers here as
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB
oracle SQL string. ``__spark_entry__.py`` re-exports these dicts for the
driver's differential check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is the equivalent DuckDB SQL (omit for
    rows-only checks on non-SQL-expressible operators)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


#: Registry iteration order for a budget-capped driver: the driver
#: evaluates the FIRST ~50 registry entries each round, so the front of
#: the dict must be the queries with the LEAST driver evidence. Round 6
#: ordering (per VERDICT r04 "Next round" #2): positions 1-50 are the
#: next tranche of the 187 queries with ZERO driver evidence after
#: r01-r05 (cumulative driver-green 174/361) — the round-2/3 TPC-H
#: reports, the UDF/arrow family, sources/quarantine, corpus sampling,
#: and one streaming entry (q_stream_foreachbatch; the family already holds r02/r03 driver evidence on seven other entries). The tranche is RUNTIME-BUDGETED: every
#: candidate was timed at sf0.01 via driver_sim (spark+oracle, round-6
#: quiet run) and the front-50 sums to 44.3 s, inside the ~60 s driver
#: window that VERDICT r04 #2 warned the streaming-heavy block would
#: blow (q_stream_static_join / q_stream_merge_partitioned /
#: q_stream_transform_state / q_dedup_embedding, 2.7-4.2 s each,
#: deferred to 51+; a final end-to-end pass of the exact front-50 with
#: round-6 code measured 53-58 s, so the third streaming entry traded
#: for q_pseudonymize to restore margin). Positions
#: 51-187 are the remaining never-driver-tested queries in the same
#: breadth-interleaved order; the 174 already driver-green follow in
#: module order (re-testing them buys nothing under the cap).
PRIORITY = (
    "q_join_full", "q_tpch_q8", "q_rollup_cascade",
    "q_dedup_incremental", "q_udaf_window", "q_csv_permissive",
    "q_stream_foreachbatch", "q_agg_salted_skew", "q_tpch_q10",
    "q_user_path", "q_tfidf_topterms", "q_cogroup_pandas",
    "q_json_quarantine", "q_embed_norm_audit", "q_join_range_binned",
    "q_tpch_q13", "q_regression", "q_url_extract",
    "q_observe_metrics", "q_orc_roundtrip", "q_pseudonymize",
    "q_date_funcs", "q_tpch_q14", "q_unpivot_long",
    "q_dq_expectations", "q_udf_scalar_iter", "q_hash_split",
    "q_case_null", "q_tpch_q15", "q_tpch_q7",
    "q_variant_json", "q_tpch_q18", "q_compact_small_files",
    "q_cap_per_group", "q_map_in_arrow", "q_sample_stratified",
    "q_tpch_q21", "q_streaks", "q_repetition_score",
    "q_pmi_bigrams", "q_sample_weighted", "q_embed_centroids",
    "q_kmeans_assign", "q_text_canonicalize", "q_except_all",
    "q_ngram_jaccard", "q_doc_fingerprint", "q_ann_ivf_topk",
    "q_multimodal_features", "q_dedup_transitive",
    # --- 51+: remaining never-driver-tested, breadth-interleaved ---
    "q_stream_static_join", "q_stream_merge_partitioned", "q_dedup_embedding",
    "q_ann_ivf_pruned", "q_multimodal_frames", "q_edit_distance",
    "q_multimodal_resize", "q_bm25_topk", "q_mad_outliers",
    "q_psi_drift", "q_word_entropy", "q_dedup_keep_canonical",
    "q_skew_report", "q_tpch_q2", "q_tpch_q9",
    "q_tpch_q11", "q_tpch_q16", "q_tpch_q20",
    "q_markov_transitions", "q_rfm_segmentation", "q_rolling_corr",
    "q_scd2_lookup", "q_embed_quantize", "q_pair_affinity",
    "q_bpe_pair_counts", "q_sessionize_batch", "q_bollinger_bands",
    "q_join_asof_forward", "q_boilerplate_ratio", "q_weighted_median",
    "q_null_impute", "q_window_dist_funcs", "q_cusum_changepoint",
    "q_interval_overlap", "q_date_spine", "q_skyline_pareto",
    "q_abc_analysis", "q_running_distinct", "q_allocation_largest_remainder",
    "q_lateral_topn", "q_exists_correlated", "q_grouping_id",
    "q_hof_arrays", "q_zipf_slope", "q_containment",
    "q_seasonal_decompose", "q_forecast_linear", "q_outlier_iqr",
    "q_ab_test_proportions", "q_yoy_growth", "q_index_rebase",
    "q_dedup_blocked_edit", "q_feature_scale", "q_one_hot_encode",
    "q_bitmap_distinct", "q_percentile_disc", "q_binaryfile_source",
    "q_power_iteration", "q_disorder_audit", "q_missing_bars",
    "q_tick_rule", "q_partial_agg_merge", "q_percentile_cont",
    "q_quality_classifier", "q_agg_filtered", "q_global_median",
    "q_hll_union_rollup", "q_attribution_last_touch", "q_text_source_lines",
    "q_stream_transform_state", "q_ri_audit", "q_multimodal_dedup",
    "q_stream_stream_join", "q_stream_ohlc", "q_bucketed_agg",
    "q_token_budget_trim", "q_dedup_chunks", "q_target_encoding",
    "q_survival_churn", "q_cohort_ltv", "q_embedding_drift",
    "q_join_asof_nearest", "q_active_users", "q_audience_overlap",
    "q_csv_multiline", "q_time_to_convert", "q_lsh_tuning_curve",
    "q_gram_matrix", "q_vocab_coverage", "q_volume_profile",
    "q_overnight_gaps", "q_price_clustering", "q_var_cvar",
    "q_drawdown_duration", "q_source_overlap", "q_dup_cluster_histogram",
    "q_sla_lateness", "q_reactivation", "q_kyle_lambda",
    "q_event_study_jumps", "q_arch_effect", "q_hhi_concentration",
    "q_roll_spread", "q_association_rules", "q_graph_components",
    "q_ttr_by_length", "q_entropy_rate", "q_adamic_adar",
    "q_degree_assortativity", "q_ulcer_index", "q_information_ratio",
    "q_updown_capture", "q_kendall_tau", "q_hurst_exponent",
    "q_spearman_corr", "q_theil_sen", "q_permutation_entropy",
    "q_calmar", "q_omega_ratio", "q_mix_weights",
    "q_winnowing", "q_mann_whitney", "q_ngram_novelty",
    "q_ndcg", "q_retrieval_metrics", "q_cohens_kappa",
    "q_class_prf", "q_brier_score", "q_sentence_stats",
    "q_sentence_dedup", "q_quantile_normalize", "q_cramers_v",
    "q_cohens_d", "q_mcnemar", "q_chunk_documents",
    "q_rolling_median", "q_sax_symbols",
)


def load_all() -> None:
    """Import every query module so decorators run (idempotent), then
    rotate the PRIORITY cross-section to the front of the registry dicts
    (python dicts preserve insertion order — the driver walks front to
    back)."""
    from stockmarketdata_dwb_etl_spark import queries  # noqa: F401

    if next(iter(QUERIES), None) == PRIORITY[0]:
        return  # already rotated
    missing = [n for n in PRIORITY if n not in QUERIES]
    if missing:
        raise KeyError(f"PRIORITY names not registered: {missing}")
    rest = [n for n in QUERIES if n not in set(PRIORITY)]
    for order_target in (QUERIES, ORACLE):
        snapshot = dict(order_target)
        order_target.clear()
        for n in (*PRIORITY, *rest):
            if n in snapshot:
                order_target[n] = snapshot[n]
