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
#: r01-r10 the cumulative record is 422 sampled (422 green, 0 red) and
#: 78 never-sampled; PRIORITY lists those 78 plus the twelve round-11
#: additions (dataops17 + dataops18), split into the round-11 front-50
#: and the r12 final 40.
#:
#: Budget rule (measured round 7, re-applied every round since): a FRESH
#: 50-query driver session costs ~1.5x the warm per-query sums
#: (+~0.3 s/query cold tax). The r11 front-50 warm sum is 101.6 s on the
#: ROUND-11 VM (scripts/tranche_timings_r11.json; single-shot driver_sim
#: timings, so they carry first-execution codegen tier-up — the bench
#: probe reads 0.175 vs r09's 0.172, i.e. this VM is r09-speed and the
#: 1.6x-vs-r10-file inflation is tier-up noise, not machine drift; the
#: measured fresh-session dry-run wall for this exact front-50 is 127 s,
#: 50/50 green) —
#: deliberately above the usual target because the round-10 verdict
#: requires the WHOLE graph family (q_degree_powerlaw,
#: q_degree_assortativity, q_resource_allocation, q_jaccard_neighbors,
#: q_adamic_adar, q_label_propagation, q_bfs_layers, q_graph_components,
#: q_kcore_peel, q_clustering_coeff) plus q_dedup_index_probe in THIS
#: rotation; ordering stays cheapest-first with the graph heavies at
#: positions 44-48 and the two streaming entries (pre-validated 2x on
#: fresh JVMs this round: 17.8/21.1 s cold, 8.4/6.9 s second session)
#: dead last, so a driver time-cut only costs the retryable tail.
#:
#: Coverage-convergence plan (round-9 verdict ask #4, r10 verdict #1/#6):
#:   - r10 tranche: DONE — CORRECTNESS_r10 = 50/50 green, cumulative 422.
#:   - r11 tranche (THIS front-50): 10 graph + q_dedup_index_probe +
#:     37 cheapest fills + q_stream_heavy_hitters/
#:     q_stream_merge_partitioned -> cumulative 472/500.
#:   - r12 tranche (final 40 = 28 staged below cheapest-first + the
#:     twelve round-11 dataops17/dataops18 additions):
#:     q_lift_gains .. q_wasserstein_drift, then q_stream_dollar_bars +
#:     q_stream_stream_join (ALREADY pre-validated 2x on fresh JVMs in
#:     r11: 9.4/9.0 s and 13.1/11.7 s, both passes green — re-confirm
#:     once on the r12 VM before handoff) + any r11 time-cut leftovers
#:     -> full 512/512.
#: Each round: re-time, re-front-load, dry-run the EXACT front-50 via
#: scripts/round_close.py before handoff. Round-11 VM re-timings for the
#: whole staging block: scripts/tranche_timings_r11.json (the r10 file
#: is a different machine — ratios only).
PRIORITY = (
    # --- r11 front-50 (warm 101.6 s on the r11 VM, cheapest-first,
    # graph heavies at the back, streaming dead last) ---
    "q_dp_count_release", "q_countmin_freq", "q_diff_in_diff",
    "q_mutual_knn", "q_degree_powerlaw", "q_cuped_adjustment",
    "q_bitemporal_asof", "q_matched_pairs_att", "q_var_backtest",
    "q_croston_forecast", "q_mfi", "q_var_cvar",
    "q_degree_assortativity", "q_conformal_intervals", "q_durbin_watson",
    "q_group_kfold", "q_matryoshka_eval", "q_shapley_attribution",
    "q_negative_sampling", "q_ngram_novelty", "q_kendall_tau",
    "q_retrieval_metrics", "q_zigzag", "q_adx",
    "q_kst", "q_pair_affinity", "q_raking_weights",
    "q_record_linkage", "q_seasonal_strength", "q_spearman_corr",
    "q_resource_allocation", "q_cdc_chunks", "q_cochran_q",
    "q_friedman", "q_label_propagation", "q_page_hinkley",
    "q_trix", "q_adamic_adar", "q_blocking_quality",
    "q_ultimate_oscillator", "q_zipf_fit", "q_jaccard_neighbors",
    "q_quantile_normalize", "q_bfs_layers", "q_clustering_coeff",
    "q_kcore_peel", "q_dedup_index_probe", "q_graph_components",
    "q_stream_heavy_hitters", "q_stream_merge_partitioned",
    # --- r12 staging: the final 28 never-sampled, cheapest-first,
    # streaming at the very back ---
    "q_lift_gains", "q_ljung_box", "q_source_overlap",
    "q_supertrend", "q_cointegration_screen", "q_er_golden_record",
    "q_audience_overlap", "q_rfm_segmentation", "q_partial_corr",
    "q_cci", "q_variance_ratio", "q_granger_lite",
    "q_heaps_law", "q_dedup_soft_weights", "q_esd_outliers",
    "q_kruskal_wallis", "q_heikin_ashi", "q_vocab_coverage",
    "q_gram_matrix", "q_hurst_exponent", "q_kalman_filter",
    "q_bootstrap_ci", "q_burrows_delta", "q_tail_dependence",
    "q_dsir_importance", "q_wasserstein_drift",
    # round-11 additions (dataops17, both-scale validated at birth):
    # data-curation screens — staged behind the frozen r11 front-50 so
    # they join the r12 tranche (28 + 6 = 34, still one tranche)
    "q_class_balance_weights", "q_temperature_mix", "q_fdr_bh",
    "q_whitening_stats", "q_label_noise_knn", "q_coreset_kcenter",
    # round-11 additions, batch 2 (dataops18, both-scale validated at
    # birth) — r12 tranche grows to 40, still one 50-query tranche
    "q_mann_kendall", "q_hampel_filter", "q_js_divergence",
    "q_kneser_ney_lm", "q_intrinsic_dim", "q_ppr_seed",
    "q_stream_dollar_bars", "q_stream_stream_join",
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
