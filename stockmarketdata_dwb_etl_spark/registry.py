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
#: r01-r09 the cumulative record is 372 sampled (372 green, 0 red) and
#: 105 never-sampled; PRIORITY now lists exactly those 105, split into
#: the round-10 front-50 and the r11+ staging block.
#:
#: Budget rule (measured round 7, re-applied every round since): a FRESH
#: 50-query driver session costs ~1.5x the warm per-query sums
#: (+~0.3 s/query cold tax). The r10 front-50 warm sum is 60.3 s —
#: deliberately above the usual ~43 s target because the round-9 verdict
#: requires the seven heavy LLM-surface flagships
#: (q_dedup_keep_canonical, q_dedup_embedding, q_power_iteration,
#: q_bpe_apply, q_split_leakage, q_global_median, q_bpe_merge_iterative)
#: plus the four cheap round-9 ops in THIS rotation; ordering stays
#: cheapest-first with the heavies at positions 40-48 and the two
#: pre-validated streaming entries dead last, so a driver time-cut only
#: costs the retryable tail. Timings: scripts/tranche_timings_r09.json.
#:
#: Coverage-convergence plan (round-9 verdict ask #4):
#:   - r10 tranche (THIS front-50, warm 60.3 s): 7 flagships + 4 r09 ops
#:     + 37 cheapest fills + q_stream_warm_start/q_stream_transform_state.
#:   - r11 tranche (next 50 of the staging block below, warm ~77 s):
#:     q_tail_dependence .. q_dedup_soft_weights cheapest-first, then
#:     q_dedup_index_probe + q_stream_heavy_hitters and
#:     q_stream_merge_partitioned (pre-validate 2x fresh first).
#:   - r12 tranche (final 25): q_stream_dollar_bars, q_stream_stream_join,
#:     the twenty round-10 additions (dataops11: q_record_linkage,
#:     q_blocking_quality, q_zipf_fit, q_heaps_law, q_group_kfold,
#:     q_negative_sampling; dataops12: q_var_backtest, q_bitemporal_asof,
#:     q_matryoshka_eval, q_dp_count_release, q_degree_powerlaw;
#:     dataops13: q_er_golden_record, q_croston_forecast, q_esd_outliers;
#:     dataops14: q_countmin_freq, q_mutual_knn, q_conformal_intervals,
#:     q_diff_in_diff; dataops15: q_shapley_attribution,
#:     q_label_propagation, q_matched_pairs_att; dataops16:
#:     q_cuped_adjustment, q_raking_weights — all cheap warm) + any
#:     r10/r11 time-cut leftovers -> full 500/500 driver coverage.
#: Each round: re-time, re-front-load, dry-run the EXACT front-50 via
#: scripts/round_close.py before the driver takes over. Round-10 VM
#: re-timings for the whole staging block (positions 51+, streaming
#: excluded): scripts/tranche_timings_r10.json — use THESE for the r11
#: cheapest-first ordering, not the r09 file (different machine).
PRIORITY = (
    # --- r10 front-50 (warm 60.3 s, cheapest-first, streaming last) ---
    "q_parkinson_vol", "q_quantile_sketch", "q_weekday_seasonality",
    "q_dup_ngram_mass", "q_preference_pairs", "q_window_funnel",
    "q_anchored_vwap", "q_elder_ray", "q_fragment_overlap",
    "q_lorenz_curve", "q_nvi_pvi", "q_theil_u",
    "q_ulcer_index", "q_chaikin_ad", "q_chande_momentum",
    "q_force_index", "q_half_life", "q_information_ratio",
    "q_ngram_coverage", "q_rrf_fusion", "q_treynor",
    "q_cohens_kappa", "q_cohort_ltv", "q_coppock",
    "q_corpus_pipeline", "q_grubbs", "q_join_asof_nearest",
    "q_keltner", "q_ndcg", "q_newey_west",
    "q_sax_symbols", "q_updown_capture", "q_wilcoxon_signed",
    "q_winnowing", "q_active_users", "q_aroon",
    "q_association_rules", "q_event_study_jumps", "q_mutual_information",
    "q_rolling_median", "q_bpe_merge_iterative", "q_global_median",
    "q_mixture_epochs", "q_split_leakage", "q_bpe_apply",
    "q_dedup_embedding", "q_power_iteration", "q_dedup_keep_canonical",
    "q_stream_warm_start", "q_stream_transform_state",
    # --- r11+ staging: the 55 remaining never-sampled, cheapest-first,
    # streaming at the very back ---
    "q_tail_dependence", "q_variance_ratio", "q_audience_overlap",
    "q_cci", "q_clustering_coeff", "q_friedman",
    "q_kst", "q_ngram_novelty", "q_retrieval_metrics",
    "q_seasonal_strength", "q_var_cvar", "q_durbin_watson",
    "q_heikin_ashi", "q_kendall_tau", "q_ljung_box",
    "q_mfi", "q_pair_affinity", "q_quantile_normalize",
    "q_spearman_corr", "q_ultimate_oscillator", "q_cochran_q",
    "q_cointegration_screen", "q_jaccard_neighbors", "q_lift_gains",
    "q_page_hinkley", "q_granger_lite", "q_hurst_exponent",
    "q_partial_corr", "q_source_overlap", "q_resource_allocation",
    "q_supertrend", "q_trix", "q_adamic_adar",
    "q_zigzag", "q_adx", "q_bfs_layers",
    "q_degree_assortativity", "q_dsir_importance", "q_graph_components",
    "q_wasserstein_drift", "q_bootstrap_ci", "q_burrows_delta",
    "q_kruskal_wallis", "q_rfm_segmentation", "q_vocab_coverage",
    "q_cdc_chunks", "q_kcore_peel", "q_kalman_filter",
    "q_gram_matrix", "q_dedup_soft_weights", "q_dedup_index_probe",
    # round-10 additions (dataops11/dataops12; both-scale validated r10)
    # — r11/r12 rotation material alongside the staging block above
    "q_negative_sampling", "q_group_kfold", "q_blocking_quality",
    "q_zipf_fit", "q_heaps_law", "q_record_linkage",
    "q_dp_count_release", "q_bitemporal_asof", "q_matryoshka_eval",
    "q_var_backtest", "q_degree_powerlaw",
    "q_croston_forecast", "q_esd_outliers", "q_er_golden_record",
    "q_diff_in_diff", "q_countmin_freq", "q_conformal_intervals",
    "q_mutual_knn", "q_shapley_attribution", "q_label_propagation",
    "q_matched_pairs_att", "q_cuped_adjustment", "q_raking_weights",
    "q_stream_heavy_hitters", "q_stream_merge_partitioned", "q_stream_dollar_bars",
    "q_stream_stream_join",
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
