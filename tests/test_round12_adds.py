"""Semantic tests for the round-12 operator batch (dataops19) — the
properties the driver's oracle hash can't see: mathematical invariants
of G², Neyman shares, BM25, winsorized moments, Haar energies, HITS
normalization, MMD non-negativity, CKA boundedness."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def _run(spark, name):
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all

    load_all()
    return QUERIES[name](spark, SF_DIR).collect()


def test_collocation_llr_invariants(spark):
    rows = _run(spark, "q_collocation_llr")
    assert 0 < len(rows) <= 15
    for r in rows:
        assert r["c_ab"] >= 5
        assert r["g2"] >= 0.0, "G² is a likelihood RATIO statistic"
    g2s = [r["g2"] for r in rows]
    assert g2s == sorted(g2s, reverse=True)


def test_neyman_allocation_shares(spark):
    rows = _run(spark, "q_neyman_allocation")
    assert len(rows) == 5  # TPC-H market segments
    total_share = sum(r["alloc_share"] for r in rows)
    assert total_share == pytest.approx(1.0, abs=1e-4)
    # rounding each share independently can drift a few units off the
    # budget, never more than n_strata/2
    assert abs(sum(r["n_alloc"] for r in rows) - 1000) <= 3
    for r in rows:
        assert r["s_h"] >= 0.0 and r["n_alloc"] >= 0


def test_bm25_scores_positive_and_ranked(spark):
    rows = _run(spark, "q_bm25_scores")
    assert len(rows) == 10
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r["bm25"] > 0.0
        assert 1 <= r["n_terms_hit"] <= 3


def test_winsorized_stats_bounds(spark):
    from pyspark.sql import functions as F

    from stockmarketdata_dwb_etl_spark.catalog import load_table

    rows = _run(spark, "q_winsorized_stats")
    raw = {
        r["event_type"]: r
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(
            F.stddev_pop("value").alias("sd"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert len(rows) > 0
    for r in rows:
        assert r["p10"] <= r["win_mean"] <= r["p90"]
        assert 0 <= r["n_clamped"] <= r["n"]
        assert r["n"] == raw[r["event_type"]]["n"]
        # clamping can only shrink dispersion
        assert r["win_sd"] <= raw[r["event_type"]]["sd"] + 1e-9


def test_haar_energy_nonnegative(spark):
    rows = _run(spark, "q_haar_energy")
    assert len(rows) > 0
    for r in rows:
        assert r["e1"] >= 0.0 and r["e2"] >= 0.0 and r["e3"] >= 0.0
        if r["n_days"] >= 2:
            # a non-constant daily return series has level-1 detail
            assert r["e1"] > 0.0


def test_hits_scores_normalized(spark):
    rows = _run(spark, "q_hits_scores")
    assert len(rows) == 10
    auths = [r["auth"] for r in rows]
    assert auths == sorted(auths, reverse=True)
    for r in rows:
        assert 0.0 < r["auth"] <= 1.0
        assert 0.0 <= r["hub"] <= 1.0
    # L1 normalization: the full vector sums to 1, so the top-10 can't
    # exceed it
    assert sum(auths) <= 1.0 + 1e-6


def test_mmd_drift_nonnegative_and_small(spark):
    rows = _run(spark, "q_mmd_drift")
    assert len(rows) == 1
    r = rows[0]
    assert r["n_a"] + r["n_b"] > 0
    assert r["mmd2"] >= 0.0
    # even/odd halves of the SAME distribution: the drift score must be
    # near zero (cos features are bounded by 1, so MMD² ≤ 4)
    assert r["mmd2"] < 0.1


def test_cka_alignment_bounded(spark):
    rows = _run(spark, "q_cka_alignment")
    assert len(rows) == 1
    r = rows[0]
    assert r["hsic_xx"] > 0.0 and r["hsic_yy"] > 0.0
    assert r["hsic_xy"] >= 0.0
    # CKA is a normalized inner product: Cauchy–Schwarz bounds it in
    # [0, 1] (rounding slack)
    assert -1e-6 <= r["cka"] <= 1.0 + 1e-6


def test_binseg_split_bounds(spark):
    rows = _run(spark, "q_binseg_split")
    assert len(rows) > 0
    for r in rows:
        assert 2 <= r["split_idx"] <= r["n_days"] - 2
        # splitting can only reduce SSE (gain ≥ 0 up to rounding)
        assert r["sse_gain"] >= -1e-6


def test_semantic_outliers_shape(spark):
    from collections import Counter

    rows = _run(spark, "q_semantic_outliers")
    per_label = Counter(r["label"] for r in rows)
    assert all(c == 5 for c in per_label.values())
    for r in rows:
        assert -1.0 - 1e-9 <= r["cos_centroid"] <= 1.0 + 1e-9
    # ascending cosine within each label (least typical first)
    by_label: dict = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r["cos_centroid"])
    for vals in by_label.values():
        assert vals == sorted(vals)


def test_effective_rank_bounds(spark):
    rows = _run(spark, "q_effective_rank")
    assert len(rows) == 1
    r = rows[0]
    assert r["ambient_dim"] == 64
    assert r["trace_cov"] > 0.0 and r["fro2_cov"] > 0.0
    # PR of a d-dim covariance lies in [1, d]
    assert 1.0 - 1e-6 <= r["effective_rank"] <= 64.0 + 1e-6


def test_temperature_scaling_unique_winner(spark):
    rows = _run(spark, "q_temperature_scaling")
    assert len(rows) == 6
    assert sum(1 for r in rows if r["is_best"]) == 1
    best = next(r for r in rows if r["is_best"])
    for r in rows:
        assert r["mean_nll"] > 0.0
        assert best["mean_nll"] <= r["mean_nll"] + 1e-9


def test_logrank_consistency(spark):
    rows = _run(spark, "q_logrank_test")
    assert len(rows) == 1
    r = rows[0]
    assert r["n_times"] > 0 and r["o1"] >= 0
    assert r["e1"] > 0.0
    if r["chi2"] is not None:
        assert r["chi2"] >= 0.0


def test_ipw_ate_identities(spark):
    rows = _run(spark, "q_ipw_ate")
    r = rows[0]
    assert r["n_treated"] > 0 and r["n_control"] > 0
    # Hajek ratio means live inside the outcome range
    assert 0.0 < r["mean_treated"] and 0.0 < r["mean_control"]
    assert r["ate"] == pytest.approx(
        r["mean_treated"] - r["mean_control"], abs=2e-4
    )
    # ESS can never exceed the group size
    assert 0 < r["ess_treated"] <= r["n_treated"]
    assert 0 < r["ess_control"] <= r["n_control"]


def test_stump_split_unique_best(spark):
    rows = _run(spark, "q_stump_split")
    assert len(rows) == 19
    assert sum(1 for r in rows if r["is_best"]) == 1
    best = next(r for r in rows if r["is_best"])
    for r in rows:
        assert r["gini_gain"] >= -1e-9, "a split cannot increase impurity"
        assert best["gini_gain"] >= r["gini_gain"] - 1e-9
        assert r["n_left"] > 0 and r["n_right"] > 0
    # thresholds monotone in rank (order statistics)
    thrs = [r["threshold"] for r in rows]
    assert thrs == sorted(thrs)


def test_freshness_decay_shares(spark):
    rows = _run(spark, "q_freshness_decay")
    assert len(rows) > 0
    assert sum(r["mass_share"] for r in rows) == pytest.approx(
        1.0, abs=1e-4
    )
    for r in rows:
        assert 0.0 < r["fresh_mass"] <= r["n"]
        assert 0.0 < r["ess"] <= r["n"]
        assert r["mean_age_days"] >= 0.0


def test_markov_attribution_shares(spark):
    rows = _run(spark, "q_markov_attribution")
    assert len(rows) == 4  # click, error, signup, view
    assert sum(r["attribution_share"] for r in rows) == pytest.approx(
        1.0, abs=1e-3
    )
    for r in rows:
        assert 0.0 <= r["base_conv"] <= 1.0
        assert 0.0 <= r["removal_conv"] <= 1.0
        # removing a channel cannot RAISE conversion
        assert r["removal_conv"] <= r["base_conv"] + 1e-9
        assert 0.0 <= r["removal_effect"] <= 1.0


def test_isotonic_calibration_monotone(spark):
    rows = _run(spark, "q_isotonic_calibration")
    assert len(rows) >= 2
    iso = [r["iso_rate"] for r in rows]
    assert iso == sorted(iso), "PAV output must be non-decreasing"
    for r in rows:
        assert 0.0 <= r["iso_rate"] <= 1.0
        assert 0.0 <= r["raw_rate"] <= 1.0
    # PAV preserves the overall mean (up to rounding)
    n_tot = sum(r["n"] for r in rows)
    mean_raw = sum(r["pos"] for r in rows) / n_tot
    mean_iso = sum(r["iso_rate"] * r["n"] for r in rows) / n_tot
    assert mean_iso == pytest.approx(mean_raw, abs=1e-4)


def test_price_elasticity_bounds(spark):
    rows = _run(spark, "q_price_elasticity")
    assert len(rows) == 25  # TPC-H brands
    for r in rows:
        assert r["n"] > 0
        if r["r2"] is not None:
            assert -1e-9 <= r["r2"] <= 1.0 + 1e-9


def test_aipw_close_to_ipw(spark):
    aipw = _run(spark, "q_aipw_ate")[0]
    ipw = _run(spark, "q_ipw_ate")[0]
    assert aipw["n"] == ipw["n_treated"] + ipw["n_control"]
    # same propensity, near-random treatment: the two estimators must
    # land in the same ballpark (loose sanity band, not equality)
    assert abs(aipw["ate_aipw"] - ipw["ate"]) < 20000.0


def test_sprt_llr_and_single_first_decision(spark):
    rows = _run(spark, "q_sprt_ab")
    assert len(rows) > 0
    llrs = [r["llr"] for r in rows]
    cums = [(r["cum_n"], r["cum_c"]) for r in rows]
    assert cums == sorted(cums), "cumulative counts must be monotone"
    assert sum(1 for r in rows if r["first_decision"]) <= 1
    import math

    # recompute one LLR from its own counts
    r = rows[-1]
    expect = r["cum_c"] * math.log(0.14 / 0.10) + (
        r["cum_n"] - r["cum_c"]
    ) * math.log(0.86 / 0.90)
    assert r["llr"] == pytest.approx(expect, abs=1e-5)


def test_nrr_waterfall_identity(spark):
    rows = _run(spark, "q_nrr_retention")
    assert len(rows) > 1
    for r in rows:
        if r["nrr"] is not None and r["starting_rev"] > 0:
            ident = (
                r["starting_rev"]
                + r["expansion"]
                - r["contraction"]
                - r["churned"]
            ) / r["starting_rev"]
            assert r["nrr"] == pytest.approx(ident, abs=1e-5)
        for c in ("expansion", "contraction", "churned", "new_rev"):
            assert r[c] >= 0.0


def test_dedup_phonetic_recovers_planted(spark):
    rows = _run(spark, "q_dedup_phonetic")
    assert len(rows) > 0
    for r in rows:
        assert r["dup_id"] == r["src_id"] + 3_000_000
        assert 0 <= r["edit_dist"] <= 3
        assert r["src_id"] % 10 == 0


def test_geometric_median_robustness_direction(spark):
    rows = _run(spark, "q_geometric_median")
    assert len(rows) == 64
    for r in rows:
        # the GM of a roughly symmetric cloud stays near the mean
        assert abs(r["shift"]) < 0.05
        assert r["gm_coord"] == pytest.approx(
            r["mean_coord"] + r["shift"], abs=2e-6
        )


def test_spectral_power_parseval_direction(spark):
    rows = _run(spark, "q_spectral_power")
    assert len(rows) > 0
    shares: dict = {}
    for r in rows:
        assert r["power"] >= 0.0
        shares.setdefault(r["symbol"], 0.0)
        shares[r["symbol"]] += r["power_share"]
    for s, tot in shares.items():
        assert tot == pytest.approx(1.0, abs=1e-3), s


def test_histogram_bins_unique_best(spark):
    rows = _run(spark, "q_histogram_bins")
    assert len(rows) == 10
    assert sum(1 for r in rows if r["is_best"]) == 1
    best = next(r for r in rows if r["is_best"])
    for r in rows:
        assert best["penalized"] >= r["penalized"] - 1e-9
        # LL of a finer partition can only grow (nesting ⇒ monotone)
    lls = [r["loglik"] for r in sorted(rows, key=lambda r: r["n_bins"])]
    assert all(b >= a - 1e-6 for a, b in zip(lls, lls[1:]))


def test_group_sequential_boundaries(spark):
    rows = _run(spark, "q_group_sequential")
    assert len(rows) == 4
    bounds = [r["of_bound"] for r in rows]
    assert bounds == sorted(bounds, reverse=True), "OF bounds tighten late"
    ns = [(r["n_treat"], r["n_ctrl"]) for r in rows]
    assert ns == sorted(ns), "cumulative look sizes must be monotone"
    for r in rows:
        if r["z_stat"] is None:
            # degenerate look (pooled rate 0 or 1): no decision possible
            assert r["crossed"] in (None, False)
        else:
            assert r["crossed"] == (abs(r["z_stat"]) >= r["of_bound"])


def test_chow_test_nonnegative_f(spark):
    rows = _run(spark, "q_chow_test")
    assert len(rows) > 0
    for r in rows:
        # splitting can only reduce SSE
        assert r["sse_split"] <= r["sse_pooled"] + 1e-6
        if r["f_stat"] is not None:
            assert r["f_stat"] >= -1e-9
