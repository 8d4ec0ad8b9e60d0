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
#: the dict must be the queries with the LEAST driver evidence. Round 4
#: ordering (per VERDICT r03 "Next round" #1): positions 1-50 are a
#: cross-family slice of the 206 never-driver-tested queries, fronting
#: the round-3 additions the judge named least-evidenced — the finance
#: indicator battery (q_vwap..q_pacf), the statistical-test battery
#: (q_chi_square..q_hill_tail_index), ML-eval (q_roc_auc/q_pr_curve/
#: q_calibration_bins), graph (one slow superstep entry, q_pagerank_iter,
#: per the r03 driver-cost advice), and warehouse/compliance
#: (q_gdpr_delete/q_snapshot_rollback/q_table_checksum/q_scd2_integrity).
#: Positions 51-206 are the remaining never-driver-tested queries in
#: their round-3 breadth-interleaved order; the 124 queries already
#: driver-green across r01-r03 follow in module order (re-testing them
#: buys nothing under the cap).
PRIORITY = (
    # --- 1-50: round-4 driver front (all with ZERO driver evidence) ---
    "q_vwap", "q_rsi", "q_macd",
    "q_log_returns", "q_volatility_gk", "q_candlestick",
    "q_atr", "q_stochastic", "q_obv",
    "q_beta_capm", "q_sharpe", "q_autocorr",
    "q_twap", "q_rank_ic", "q_sortino",
    "q_rolling_beta", "q_jarque_bera", "q_amihud_illiquidity",
    "q_market_profile", "q_acf_correlogram", "q_pacf",
    "q_chi_square", "q_gini", "q_benford",
    "q_ttest_welch", "q_hist2d", "q_runs_test",
    "q_anova_hod", "q_ks_test", "q_hill_tail_index",
    "q_roc_auc", "q_pr_curve", "q_calibration_bins",
    "q_triangle_count", "q_bfs_distance", "q_degree_centrality",
    "q_common_neighbors", "q_pagerank_iter", "q_gdpr_delete",
    "q_snapshot_rollback", "q_table_checksum", "q_scd2_integrity",
    "q_pipeline_incremental", "q_interarrival_stats", "q_burstiness",
    "q_forecast_holt", "q_lead_lag_xcorr", "q_dedup_cross_corpus",
    "q_cluster_purity", "q_peak_concurrency", "q_join_full",
    # --- 51+: remaining never-driver-tested, breadth-interleaved ---
    "q_tpch_q8", "q_rollup_cascade",
    "q_dedup_incremental", "q_udaf_window", "q_csv_permissive",
    "q_stream_foreachbatch", "q_agg_salted_skew", "q_tpch_q10",
    "q_user_path", "q_tfidf_topterms", "q_cogroup_pandas",
    "q_json_quarantine", "q_stream_stream_join", "q_join_range_binned",
    "q_tpch_q13", "q_regression", "q_url_extract",
    "q_observe_metrics", "q_orc_roundtrip", "q_stream_transform_state",
    "q_date_funcs", "q_tpch_q14", "q_unpivot_long",
    "q_dq_expectations", "q_udf_scalar_iter", "q_hash_split",
    "q_stream_static_join", "q_case_null", "q_tpch_q15",
    "q_tpch_q7", "q_variant_json", "q_tpch_q18",
    "q_compact_small_files", "q_cap_per_group", "q_map_in_arrow",
    "q_stream_merge_partitioned", "q_sample_stratified", "q_tpch_q21",
    "q_streaks", "q_repetition_score", "q_pmi_bigrams",
    "q_sample_weighted", "q_embed_centroids", "q_kmeans_assign",
    "q_text_canonicalize", "q_except_all", "q_ngram_jaccard",
    "q_doc_fingerprint", "q_dedup_embedding", "q_ann_ivf_topk",
    "q_multimodal_features", "q_dedup_transitive", "q_ann_ivf_pruned",
    "q_multimodal_frames", "q_edit_distance", "q_multimodal_resize",
    "q_bm25_topk", "q_mad_outliers", "q_psi_drift",
    "q_word_entropy", "q_dedup_keep_canonical", "q_skew_report",
    "q_tpch_q2", "q_tpch_q9", "q_tpch_q11",
    "q_tpch_q16", "q_tpch_q20", "q_markov_transitions",
    "q_rfm_segmentation", "q_rolling_corr", "q_scd2_lookup",
    "q_embed_quantize", "q_pair_affinity", "q_bpe_pair_counts",
    "q_sessionize_batch", "q_bollinger_bands", "q_join_asof_forward",
    "q_boilerplate_ratio", "q_weighted_median", "q_null_impute",
    "q_window_dist_funcs", "q_cusum_changepoint", "q_interval_overlap",
    "q_date_spine", "q_skyline_pareto", "q_abc_analysis",
    "q_running_distinct", "q_allocation_largest_remainder", "q_lateral_topn",
    "q_exists_correlated", "q_grouping_id", "q_hof_arrays",
    "q_zipf_slope", "q_containment", "q_seasonal_decompose",
    "q_forecast_linear", "q_outlier_iqr", "q_ab_test_proportions",
    "q_yoy_growth", "q_index_rebase", "q_dedup_blocked_edit",
    "q_feature_scale", "q_one_hot_encode", "q_bitmap_distinct",
    "q_percentile_disc", "q_binaryfile_source", "q_power_iteration",
    "q_disorder_audit", "q_missing_bars", "q_tick_rule",
    "q_partial_agg_merge", "q_percentile_cont", "q_quality_classifier",
    "q_agg_filtered", "q_global_median", "q_hll_union_rollup",
    "q_attribution_last_touch", "q_text_source_lines", "q_pseudonymize",
    "q_ri_audit", "q_multimodal_dedup", "q_embed_norm_audit",
    "q_stream_ohlc", "q_bucketed_agg", "q_token_budget_trim",
    "q_dedup_chunks", "q_target_encoding", "q_survival_churn",
    "q_cohort_ltv", "q_embedding_drift", "q_join_asof_nearest",
    "q_active_users", "q_audience_overlap", "q_csv_multiline",
    "q_time_to_convert", "q_lsh_tuning_curve", "q_gram_matrix",
    "q_vocab_coverage", "q_volume_profile", "q_overnight_gaps",
    "q_price_clustering", "q_var_cvar", "q_drawdown_duration",
    "q_source_overlap", "q_dup_cluster_histogram", "q_sla_lateness",
    "q_reactivation", "q_kyle_lambda", "q_event_study_jumps",
    "q_arch_effect", "q_hhi_concentration", "q_roll_spread",
    "q_association_rules", "q_graph_components", "q_ttr_by_length",
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
