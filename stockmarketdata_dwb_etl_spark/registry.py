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
#: the dict must be the queries with the LEAST driver evidence. Round 3
#: ordering (per VERDICT r02 "Next round" #1-2): positions 1-10 are the
#: ten queries that ERRORED in round 1 (nanos-read / no_oracle
#: casualties, all since fixed in the builder suite but never driver
#: re-confirmed); positions 11-50 are a cross-family breadth slice of
#: the 97 never-driver-tested queries; after that the remaining
#: never-tested, and the 74 queries already driver-green across
#: r01+r02 come LAST (re-testing them buys nothing under the cap).
PRIORITY = (
    # --- 1-10: failed in r1 (err), fixed, need a driver-green row ---
    "q_pivot", "q_dedup_keys", "q_props_map", "q_agg_bool_bitwise",
    "q_approx_distinct", "q_window_first_last", "q_sql_text",
    "q_cohort_retention", "q_approx_percentile", "q_dedup_simhash",
    # --- 11-50: breadth slice of the never-driver-tested surface ---
    # joins
    "q_join_left", "q_join_semi", "q_join_anti", "q_join_range",
    "q_join_null_safe", "q_join_asof_tolerance", "q_join_salted_skew",
    # windows
    "q_window_lag_change", "q_window_running_sum", "q_window_ntile",
    # scalars battery
    "q_pct_parse", "q_cast_comma_numeric", "q_string_funcs",
    "q_math_funcs", "q_array_funcs",
    # set ops
    "q_intersect_all",
    # TPC-H spread
    "q_tpch_q4", "q_tpch_q12", "q_tpch_q17", "q_tpch_q19", "q_tpch_q22",
    # timeseries
    "q_gap_fill_locf", "q_drawdown", "q_winsorize", "q_zscore_outliers",
    "q_corr_pairs",
    # corpus / LLM-pipeline (cut at positions 51-55 in r2)
    "q_contamination", "q_pack_sequences", "q_lm_score",
    "q_token_count_bpe", "q_quality_gate", "q_pii_scrub",
    # storage / warehouse
    "q_schema_evolution", "q_scd2_apply",
    # streaming (real availableNow runs)
    "q_stream_dedup", "q_sliding_window", "q_stream_session",
    # UDF machinery
    "q_udaf_grouped", "q_udtf_explode",
    # sources
    "q_xml_source",
    # --- 51+: the rest of the never-driver-tested, families interleaved,
    # so a driver that gets past 50 keeps producing fresh evidence ---
    "q_join_full", "q_tpch_q8", "q_rollup_cascade", "q_dedup_incremental",
    "q_udaf_window", "q_csv_permissive", "q_stream_foreachbatch",
    "q_agg_salted_skew", "q_tpch_q10", "q_user_path", "q_tfidf_topterms",
    "q_cogroup_pandas", "q_json_quarantine", "q_stream_stream_join",
    "q_join_range_binned", "q_tpch_q13", "q_regression", "q_url_extract",
    "q_observe_metrics", "q_orc_roundtrip", "q_stream_transform_state",
    "q_date_funcs", "q_tpch_q14", "q_unpivot_long", "q_dq_expectations",
    "q_udf_scalar_iter", "q_hash_split", "q_stream_static_join",
    "q_case_null", "q_tpch_q15", "q_tpch_q7", "q_variant_json",
    "q_tpch_q18", "q_compact_small_files", "q_cap_per_group",
    "q_map_in_arrow", "q_stream_merge_partitioned", "q_sample_stratified",
    "q_tpch_q21", "q_streaks", "q_repetition_score", "q_pmi_bigrams",
    "q_sample_weighted", "q_embed_centroids", "q_kmeans_assign",
    "q_text_canonicalize", "q_except_all", "q_ngram_jaccard",
    "q_doc_fingerprint", "q_dedup_embedding", "q_ann_ivf_topk",
    "q_multimodal_features", "q_dedup_transitive", "q_ann_ivf_pruned",
    "q_multimodal_frames", "q_edit_distance", "q_multimodal_resize",
    # round-3 additions (no driver evidence yet, ahead of the proven set)
    "q_bm25_topk", "q_mad_outliers", "q_psi_drift", "q_word_entropy",
    "q_dedup_keep_canonical", "q_skew_report",
    # round-3 TPC-H completion (partsupp rebased onto the lineitem
    # supply catalog — see queries/reports3.py)
    "q_tpch_q2", "q_tpch_q9", "q_tpch_q11", "q_tpch_q16", "q_tpch_q20",
    # round-3 analytics batch (queries/analytics2.py)
    "q_markov_transitions", "q_rfm_segmentation", "q_ks_test",
    "q_rolling_corr", "q_scd2_lookup",
    # round-3 corpus/ML batch (queries/dataops4.py)
    "q_embed_quantize", "q_pair_affinity", "q_bpe_pair_counts",
    # round-3 timeseries/graph batch (queries/timeseries2.py, graph.py)
    "q_sessionize_batch", "q_bollinger_bands", "q_join_asof_forward",
    "q_pagerank_iter", "q_triangle_count",
    # round-3 batch 4: corpus signal + stats + window coverage
    "q_boilerplate_ratio", "q_weighted_median", "q_null_impute",
    "q_window_dist_funcs",
    # round-3 batch 5: changepoint, interval join, calendar spine
    "q_cusum_changepoint", "q_interval_overlap", "q_date_spine",
    # round-3 batch 6: skyline, ABC, running distinct, allocation
    "q_skyline_pareto", "q_abc_analysis", "q_running_distinct",
    "q_allocation_largest_remainder",
    # round-3 batch 7: market-indicator battery (queries/finance.py)
    "q_vwap", "q_rsi", "q_macd", "q_log_returns", "q_volatility_gk",
    "q_candlestick",
    # round-3 batch 8: statistical-test battery (queries/stats_q.py)
    "q_chi_square", "q_gini", "q_benford", "q_ttest_welch", "q_hist2d",
    # round-3 batch 9: SQL front-door surface (queries/relational.py)
    "q_lateral_topn", "q_exists_correlated", "q_grouping_id", "q_hof_arrays",
    # round-3 batch 10: corpus health + graph centrality
    "q_zipf_slope", "q_containment", "q_degree_centrality",
    "q_common_neighbors",
    # round-3 batch 11: decomposition / forecast / IQR fences
    "q_seasonal_decompose", "q_forecast_linear", "q_outlier_iqr",
    # round-3 batch 12: A/B proportions, YoY, rebase, blocked fuzzy dedup
    "q_ab_test_proportions", "q_yoy_growth", "q_index_rebase",
    "q_dedup_blocked_edit",
    # round-3 batch 13: ML feature engineering
    "q_feature_scale", "q_one_hot_encode",
    # round-3 batch 14: bitmap exact-distinct + discrete percentile
    "q_bitmap_distinct", "q_percentile_disc",
    # round-3 batch 15: whole-file binary ingest (multimodal landing)
    "q_binaryfile_source",
    # round-3 batch 16: iterative linear algebra (power iteration)
    "q_power_iteration",
    # round-3 batch 17: compliance erasure + snapshot rollback
    "q_gdpr_delete", "q_snapshot_rollback",
    # round-3 batch 18: feed-quality + microstructure audits
    "q_disorder_audit", "q_missing_bars", "q_tick_rule",
    # round-3 batch 19: risk/benchmark indicator battery (finance2.py)
    "q_atr", "q_stochastic", "q_obv", "q_beta_capm", "q_sharpe",
    "q_autocorr",
    # round-3 batch 20: BFS supersteps, mergeable-state rollup,
    # exact interpolated percentiles
    "q_bfs_distance", "q_partial_agg_merge", "q_percentile_cont",
    # round-3 batch 21: cross-corpus decontamination, linear quality
    # classifier, FILTER-clause conditional aggregation
    "q_dedup_cross_corpus", "q_quality_classifier", "q_agg_filtered",
    # round-3 batch 22: scale-path exact global quantiles + mergeable
    # HLL sketch rollup
    "q_global_median", "q_hll_union_rollup",
    # round-3 batch 23: last-touch attribution + text-lines landing
    "q_attribution_last_touch", "q_text_source_lines",
    # round-3 batch 24: pseudonymization view + referential-integrity audit
    "q_pseudonymize", "q_ri_audit",
    # round-3 batch 25: media content-addressable dedup + embedding audit
    "q_multimodal_dedup", "q_embed_norm_audit",
    # round-3 batch 26: watermarked streaming OHLCV bars (flagship, live)
    "q_stream_ohlc",
    # round-3 batch 27: exchange-free aggregation on the bucketed layout
    "q_bucketed_agg",
    # round-3 batch 28: quality-ranked token-budget corpus trim
    "q_token_budget_trim",
    # round-3 batch 29: incremental daily pipeline (truncate-reload
    # upgraded to keyed MERGE, proven equal to the full run)
    "q_pipeline_incremental",
    # round-3 batch 30: clustering-quality metrics (purity + NMI)
    "q_cluster_purity",
    # round-3 batch 31: quant-research metrics (rank IC, Jarque-Bera,
    # Amihud illiquidity)
    "q_rank_ic", "q_jarque_bera", "q_amihud_illiquidity",
    # round-3 batch 32: sub-document chunk dedup (paragraph granularity)
    "q_dedup_chunks",
    # round-3 batch 33: TWAP + smoothed target encoding
    "q_twap", "q_target_encoding",
    # round-3 batch 34: SCD2 temporal-integrity audit
    "q_scd2_integrity",
    # round-3 batch 35: Kaplan-Meier churn survival curve
    "q_survival_churn",
    # round-3 batch 36: cohort LTV matrix + embedding drift monitor
    "q_cohort_ltv", "q_embedding_drift",
    # round-3 batch 37: nearest-direction as-of join
    "q_join_asof_nearest",
    # round-3 batch 38: exact sliding-distinct DAU/WAU via bitmap merge
    "q_active_users",
    # round-3 batch 39: Holt double-exponential forecast
    "q_forecast_holt",
    # round-3 batch 40: bitmap audience-overlap matrix
    "q_audience_overlap",
    # round-3 batch 41: lead-lag cross-correlation
    "q_lead_lag_xcorr",
    # round-3 batch 42: multiline-CSV ingest + time-to-convert funnel
    "q_csv_multiline", "q_time_to_convert",
    # round-3 batch 43: order-invariant reconciliation checksum
    "q_table_checksum",
    # round-3 batch 44: exact ROC-AUC (Mann-Whitney integer form)
    "q_roc_auc",
    # round-3 batch 45: PR operating points + calibration bins
    "q_pr_curve", "q_calibration_bins",
    # round-3 batch 46: sweep-line concurrency + LSH S-curve table
    "q_peak_concurrency", "q_lsh_tuning_curve",
    # round-3 batch 47: one-pass Gram matrix (PCA precursor)
    "q_gram_matrix",
    # round-3 batch 48: vocab coverage + intraday volume profile
    "q_vocab_coverage", "q_volume_profile",
    # round-3 batch 49: overnight gaps + price clustering
    "q_overnight_gaps", "q_price_clustering",
    # round-3 batch 50: historical VaR/CVaR + drawdown duration
    "q_var_cvar", "q_drawdown_duration",
    # round-3 batch 51: source-overlap matrix + dup-cluster histogram
    "q_source_overlap", "q_dup_cluster_histogram",
    # round-3 batch 52: order-to-ship SLA + customer reactivation
    "q_sla_lateness", "q_reactivation",
    # round-3 batch 53: Kyle lambda + jump event study
    "q_kyle_lambda", "q_event_study_jumps",
    # round-3 batch 54: ARCH-effect test + Sortino ratio
    "q_arch_effect", "q_sortino",
    # round-3 batch 55: HHI concentration + Roll implied spread
    "q_hhi_concentration", "q_roll_spread",
    # round-3 batch 56: rolling 100-bar CAPM beta
    "q_rolling_beta",
    # round-3 batch 57: one-way ANOVA (hour-of-day effect)
    "q_anova_hod",
    # round-3 batch 58: directed association rules
    "q_association_rules",
    # round-3 batch 59: Hill tail-index estimator
    "q_hill_tail_index",
    # round-3 batch 60: arrival-process diagnostics
    "q_interarrival_stats", "q_burstiness",
    # round-3 batch 61: component-size distribution (min-label supersteps)
    "q_graph_components",
    # round-3 batch 62: type-token ratio lexical-diversity curve
    "q_ttr_by_length",
    # round-3 batch 63: Wald-Wolfowitz runs test
    "q_runs_test",
    # round-3 batch 64: market profile (modal price levels)
    "q_market_profile",
    # round-3 batch 65: ACF correlogram (lags 1-5)
    "q_acf_correlogram",
    # round-3 batch 66: PACF via Durbin-Levinson
    "q_pacf",
    # (the 74 queries already driver-green in r01/r02 follow in module
    # order — deliberately last under the driver's ~50-entry budget)
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
