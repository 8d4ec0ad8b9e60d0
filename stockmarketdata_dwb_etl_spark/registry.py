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
#: the dict must be the queries with the LEAST driver evidence. After
#: r01-r07 the cumulative driver-green set is 274/438 (the r07 front-50
#: converted 50/50); the 164 still-unsampled queries fill positions
#: 1-164 as three pre-staged tranches (r08 pos 1-50, r09/r10 below).
#:
#: Budget rule (measured round 7, re-applied round 8): a FRESH 50-query
#: driver session costs ~1.5x the warm per-query sums (+~0.3 s/query
#: cold tax: per-plan codegen, cold parquet footers, cold scratch), so
#: the front-50 targets a <=43 s warm sum (1.5x + startup lands under
#: the ~80 s risk band). Round-8 front-50: warm sum 42.7 s = the 49
#: cheapest non-streaming entries of the oversize r08 block + the one
#: cheapest streaming entry, ordered CHEAPEST-FIRST with the streaming
#: entry last, so a driver time-cut only costs the retryable tail.
#: Timings: scripts/tranche_timings_r08.json (the nine late round-7
#: additions re-timed warm this round). The 19 deferred heavies (sum
#: 80.2 s, five of the six remaining streaming entries among them) head
#: the r09 block — r09 MUST re-budget the same way: re-time, pick
#: ~45-50 cheapest-first with <=3 streaming, dry-run the exact front-50
#: (scripts/round_close.py), push the rest back. The 274 already-green
#: queries follow in module order.
PRIORITY = (
    "q_concordance", "q_brier_score", "q_cohens_d",
    "q_mcc", "q_mix_weights", "q_pivot_points",
    "q_sentence_stats", "q_sla_lateness", "q_time_to_convert",
    "q_word_burstiness", "q_abc_analysis", "q_agg_filtered",
    "q_containment", "q_embed_quantize", "q_feature_scale",
    "q_forecast_linear", "q_grouping_id", "q_hll_union_rollup",
    "q_lateral_topn", "q_multimodal_dedup", "q_one_hot_encode",
    "q_outlier_iqr", "q_percentile_cont", "q_target_encoding",
    "q_text_source_lines", "q_index_rebase", "q_lang_id_confusion",
    "q_null_impute", "q_quality_classifier", "q_survival_churn",
    "q_tick_rule", "q_allocation_largest_remainder", "q_mips_norm_augment",
    "q_seasonal_decompose", "q_cusum_changepoint", "q_dedup_chunks",
    "q_ri_audit", "q_running_distinct", "q_window_dist_funcs",
    "q_rare_label_fold", "q_token_budget_trim", "q_bucketed_agg",
    "q_anderson_darling", "q_destutter", "q_psi_drift",
    "q_sequence_packing", "q_vortex", "q_yang_zhang_vol",
    "q_gopher_repetition", "q_stream_ohlc",
    # --- pre-staged r09 tranche: the 19 round-8 deferrals (sum 80.2 s
    # warm at sf0.01 — OVERSIZE and streaming-heavy by design, five
    # streaming entries; r09 re-budgets per the rule above) + the
    # original r09 block (50 queries, 55.9 s at sf0.01) ---
    "q_dedup_keep_canonical", "q_stream_merge_partitioned", "q_dedup_embedding",
    "q_bpe_merge_iterative", "q_bpe_apply", "q_stream_heavy_hitters",
    "q_stream_warm_start", "q_wasserstein_drift", "q_split_leakage",
    "q_chande_momentum", "q_adx", "q_durbin_watson",
    "q_dsir_importance", "q_rfm_segmentation", "q_pair_affinity",
    "q_power_iteration", "q_global_median", "q_stream_transform_state",
    "q_stream_stream_join",
    "q_cohort_ltv", "q_join_asof_nearest", "q_active_users",
    "q_audience_overlap", "q_lsh_tuning_curve", "q_gram_matrix",
    "q_vocab_coverage", "q_volume_profile", "q_overnight_gaps",
    "q_var_cvar", "q_drawdown_duration", "q_source_overlap",
    "q_dup_cluster_histogram", "q_reactivation", "q_kyle_lambda",
    "q_event_study_jumps", "q_arch_effect", "q_roll_spread",
    "q_association_rules", "q_graph_components", "q_entropy_rate",
    "q_adamic_adar", "q_degree_assortativity", "q_ulcer_index",
    "q_information_ratio", "q_updown_capture", "q_kendall_tau",
    "q_hurst_exponent", "q_spearman_corr", "q_theil_sen",
    "q_permutation_entropy", "q_calmar", "q_omega_ratio",
    "q_winnowing", "q_mann_whitney", "q_ngram_novelty",
    "q_ndcg", "q_retrieval_metrics", "q_cohens_kappa",
    "q_class_prf", "q_sentence_dedup", "q_quantile_normalize",
    "q_cramers_v", "q_rolling_median", "q_sax_symbols",
    "q_corpus_pipeline", "q_stream_quality_gate", "q_stream_dollar_bars",
    "q_donchian", "q_tokenizer_fertility",
    # --- pre-staged r10 tranche: 45 queries, 49.4s at sf0.01 ---
    "q_williams_r", "q_cci", "q_mfi",
    "q_cmf", "q_ichimoku", "q_keltner",
    "q_aroon", "q_trix", "q_heikin_ashi",
    "q_kalman_filter", "q_treynor", "q_kelly_criterion",
    "q_variance_ratio", "q_tail_dependence", "q_cointegration_screen",
    "q_dollar_bars", "q_bootstrap_ci", "q_newey_west",
    "q_seasonal_strength", "q_partial_corr", "q_adf_lite",
    "q_page_hinkley", "q_regression_metrics", "q_lift_gains",
    "q_clustering_coeff", "q_jaccard_neighbors", "q_flesch_reading",
    "q_theil_u", "q_resource_allocation", "q_burrows_delta",
    "q_skipgram_cooc", "q_span_corruption", "q_lm_cross_split",
    "q_kruskal_wallis", "q_levene_bf", "q_wilcoxon_signed",
    "q_friedman", "q_grubbs", "q_bartlett",
    "q_cochran_q", "q_moments", "q_trimmed_mean",
    "q_granger_lite", "q_mutual_information", "q_odds_ratio",
    # (round-8 additions, appended at the BACK of the r10 tranche per
    # the hold-the-line rule; sf0.01 warm spark+oracle costs recorded
    # in scripts/tranche_timings_r08.json in the same commit)
    "q_parkinson_vol", "q_ultimate_oscillator", "q_force_index",
    "q_chaikin_ad", "q_dpo", "q_epoch_shuffle",
    "q_curriculum_buckets", "q_url_canonicalize", "q_filter_funnel",
    "q_attribution_position", "q_lorenz_curve", "q_weekday_seasonality",
    "q_coppock", "q_kst", "q_elder_ray",
    "q_nvi_pvi", "q_market_breadth", "q_ngram_coverage",
    "q_waterfall_contribution", "q_semdedup_clusters",
    "q_context_window_stats", "q_window_funnel",
    "q_kcore_peel", "q_bfs_layers", "q_ljung_box", "q_half_life",
    "q_embedding_outliers", "q_dup_ngram_mass", "q_supertrend", "q_zigzag",
    "q_anchored_vwap", "q_fragment_overlap",
)


def load_all() -> None:
    """Import every query module so decorators run (idempotent), then
    rotate the PRIORITY cross-section to the front of the registry dicts
    (python dicts preserve insertion order — the driver walks front to
    back)."""
    from stockmarketdata_dwb_etl_spark import queries  # noqa: F401

    if next(iter(QUERIES), None) == PRIORITY[0]:
        return  # already rotated
    if len(set(PRIORITY)) != len(PRIORITY):
        from collections import Counter

        dups = [n for n, c in Counter(PRIORITY).items() if c > 1]
        raise ValueError(f"duplicate PRIORITY entries: {dups}")
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
