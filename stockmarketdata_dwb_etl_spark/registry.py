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
#: r01-r08 the cumulative record is 324 sampled (322 green + the two r08
#: reds re-staged below) and 146 never-sampled.
#:
#: Budget rule (measured round 7, re-applied every round since): a FRESH
#: 50-query driver session costs ~1.5x the warm per-query sums
#: (+~0.3 s/query cold tax: per-plan codegen, cold parquet footers, cold
#: scratch), so the front-50 targets a ~43 s warm sum (1.5x + startup
#: lands under the ~80 s risk band), ordered CHEAPEST-FIRST with
#: streaming entries last, so a driver time-cut only costs the
#: retryable tail. Timings: scripts/tranche_timings_r08.json.
#:
#: Round-9 front-50 (warm sum 44.4 s, 1 streaming entry): the two r08
#: reds re-staged post-fix (q_feature_scale oracle DOUBLE[] cast,
#: q_one_hot_encode bit-string output contract), the four queries whose
#: determinism hardening changed this round (q_attribution_position,
#: q_url_canonicalize, q_embedding_outliers, q_semdedup_clusters — fresh
#: code needs driver evidence before stable code does), and the 44
#: cheapest never-sampled fills. The heavier LLM-surface conversions
#: (q_dedup_keep_canonical, q_dedup_embedding, q_bpe pair,
#: q_split_leakage, q_power_iteration, q_global_median) sit at the BACK
#: of the r10 staging block below, cheapest-first, as do the six
#: remaining streaming entries (pre-validate each under a vanilla
#: session before its round, per the round-8 verdict).
PRIORITY = (
    # --- r09 front-50 ---
    "q_bartlett", "q_odds_ratio", "q_tokenizer_fertility",
    "q_calmar", "q_cramers_v", "q_dollar_bars",
    "q_drawdown_duration", "q_dup_cluster_histogram", "q_feature_scale",
    "q_filter_funnel", "q_flesch_reading", "q_kelly_criterion",
    "q_moments", "q_omega_ratio", "q_one_hot_encode",
    "q_overnight_gaps", "q_reactivation", "q_roll_spread",
    "q_sentence_dedup", "q_trimmed_mean", "q_volume_profile",
    "q_waterfall_contribution", "q_williams_r", "q_adf_lite",
    "q_arch_effect", "q_cmf", "q_donchian",
    "q_entropy_rate", "q_epoch_shuffle", "q_kyle_lambda",
    "q_lsh_tuning_curve", "q_permutation_entropy", "q_regression_metrics",
    "q_skipgram_cooc", "q_span_corruption", "q_theil_sen",
    "q_class_prf", "q_context_window_stats", "q_curriculum_buckets",
    "q_dpo", "q_ichimoku", "q_levene_bf",
    "q_lm_cross_split", "q_mann_whitney", "q_market_breadth",
    "q_attribution_position", "q_url_canonicalize", "q_embedding_outliers",
    "q_semdedup_clusters", "q_stream_quality_gate",
    # --- r10+ staging: the 98 remaining never-sampled, cheapest-first
    # (warm sum 203.8 s — ~2.5 rounds of budget; streaming at the very
    # back). Each round: re-time, pick ~45-50 cheapest-first with <=3
    # streaming, dry-run the exact front-50 via scripts/round_close.py.
    "q_page_hinkley", "q_retrieval_metrics", "q_rolling_median",
    "q_theil_u", "q_ulcer_index", "q_var_cvar",
    "q_vocab_coverage", "q_aroon", "q_cci",
    "q_cohens_kappa", "q_cohort_ltv", "q_grubbs",
    "q_mfi", "q_newey_west", "q_wilcoxon_signed",
    "q_winnowing", "q_elder_ray", "q_event_study_jumps",
    "q_information_ratio", "q_join_asof_nearest", "q_keltner",
    "q_ndcg", "q_nvi_pvi", "q_sax_symbols",
    "q_tail_dependence", "q_treynor", "q_weekday_seasonality",
    "q_degree_assortativity", "q_friedman", "q_kalman_filter",
    "q_kendall_tau", "q_ngram_novelty", "q_quantile_normalize",
    "q_spearman_corr", "q_updown_capture", "q_variance_ratio",
    "q_active_users", "q_chaikin_ad", "q_ngram_coverage",
    "q_audience_overlap", "q_kst", "q_seasonal_strength",
    "q_clustering_coeff", "q_force_index", "q_fragment_overlap",
    "q_heikin_ashi", "q_cochran_q", "q_cointegration_screen",
    "q_dup_ngram_mass", "q_granger_lite", "q_half_life",
    "q_hurst_exponent", "q_lift_gains", "q_mutual_information",
    "q_trix", "q_anchored_vwap", "q_association_rules",
    "q_lorenz_curve", "q_resource_allocation", "q_window_funnel",
    "q_partial_corr", "q_source_overlap", "q_parkinson_vol",
    "q_kruskal_wallis", "q_bootstrap_ci", "q_coppock",
    "q_jaccard_neighbors", "q_pair_affinity", "q_durbin_watson",
    "q_adamic_adar", "q_dsir_importance", "q_power_iteration",
    "q_gram_matrix", "q_chande_momentum", "q_rfm_segmentation",
    "q_ultimate_oscillator", "q_bfs_layers", "q_burrows_delta",
    "q_ljung_box", "q_zigzag", "q_global_median",
    "q_stream_dollar_bars", "q_dedup_embedding", "q_graph_components",
    "q_supertrend", "q_corpus_pipeline", "q_adx",
    "q_bpe_apply", "q_wasserstein_drift", "q_stream_transform_state",
    "q_bpe_merge_iterative", "q_dedup_keep_canonical", "q_split_leakage",
    "q_stream_stream_join", "q_stream_merge_partitioned", "q_kcore_peel",
    "q_stream_heavy_hitters", "q_stream_warm_start",
    # (round-9 additions, appended at the BACK per the hold-the-line
    # rule; warm timings in scripts/tranche_timings_r09.json)
    "q_rrf_fusion", "q_preference_pairs", "q_quantile_sketch",
    "q_mixture_epochs", "q_dedup_soft_weights", "q_cdc_chunks",
    "q_dedup_index_probe",
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
