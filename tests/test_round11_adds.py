"""Semantic pins for the round-11 data-curation operators (dataops17):
invariants the math guarantees, independent of the DuckDB differential."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module", autouse=True)
def _load():
    from stockmarketdata_dwb_etl_spark.registry import load_all

    load_all()


def _run(spark, name):
    from stockmarketdata_dwb_etl_spark.registry import QUERIES

    return QUERIES[name](spark, SF_DIR).collect()


def test_class_balance_weights_axioms(spark):
    rows = _run(spark, "q_class_balance_weights")
    k = len(rows)
    assert k >= 2
    # the normalized effective-number weights average to 1 over classes
    assert sum(r["class_balanced_weight"] for r in rows) / k == pytest.approx(
        1.0, abs=1e-4
    )
    # inverse-frequency: w_c * n_c is the same for every class (= N/K)
    prods = [r["inv_freq_weight"] * r["n_docs"] for r in rows]
    assert max(prods) - min(prods) < max(prods) * 1e-4
    # rarer class -> strictly larger weight (both schemes)
    by_n = sorted(rows, key=lambda r: r["n_docs"])
    assert by_n[0]["inv_freq_weight"] > by_n[-1]["inv_freq_weight"]
    assert by_n[0]["class_balanced_weight"] >= by_n[-1]["class_balanced_weight"]


def test_temperature_mix_axioms(spark):
    rows = _run(spark, "q_temperature_mix")
    assert sum(r["sample_weight"] for r in rows) == pytest.approx(1.0, abs=1e-4)
    # α < 1 boosts the tail and damps the head
    by_share = sorted(rows, key=lambda r: r["share"])
    assert by_share[0]["boost"] > 1.0
    assert by_share[-1]["boost"] < 1.0
    # boosts are monotone decreasing in share
    boosts = [r["boost"] for r in by_share]
    assert boosts == sorted(boosts, reverse=True)


def test_fdr_bh_is_step_up_prefix(spark):
    rows = _run(spark, "q_fdr_bh")
    assert rows, "no testable symbols"
    # p sorted ascending by rank, thresholds ascending, rejections a prefix
    ps = [r["p_value"] for r in rows]
    assert ps == sorted(ps)
    assert all(0.0 <= p <= 1.0 for p in ps)
    thr = [r["bh_threshold"] for r in rows]
    assert thr == sorted(thr)
    flags = [r["rejected"] for r in rows]
    assert flags == sorted(flags, reverse=True), "rejected set must be a prefix"
    # every rejected row actually sits at-or-under SOME later threshold
    # (the step-up property: p_i <= thr_j for the cut rank j >= i)
    if any(flags):
        j = max(i for i, f in enumerate(flags) if f)
        assert rows[j]["p_value"] <= rows[j]["bh_threshold"] + 1e-12


def test_kcenter_greedy_distances_nonincreasing(spark):
    rows = _run(spark, "q_coreset_kcenter")
    assert [r["step"] for r in rows] == list(range(1, len(rows) + 1))
    assert rows[0]["center_id"] == 0 and rows[0]["dist_to_set"] == 0.0
    ids = [r["center_id"] for r in rows]
    assert len(set(ids)) == len(ids), "centers must be distinct"
    # greedy max-min: each selection's distance can only shrink
    dists = [r["dist_to_set"] for r in rows[1:]]
    assert dists == sorted(dists, reverse=True)
    assert all(d > 0 for d in dists)


def test_label_noise_bounds(spark):
    rows = _run(spark, "q_label_noise_knn")
    assert rows
    for r in rows:
        assert 0.0 <= r["avg_disagreement"] <= 1.0
        assert 0 <= r["n_suspect_noisy"] <= r["n_probes"]


def test_whitening_stats_shape(spark):
    rows = _run(spark, "q_whitening_stats")
    assert len(rows) == 10
    for r in rows:
        assert 1 <= r["dim_a"] < r["dim_b"] <= 64
        assert abs(r["corr"]) <= 1.0 + 1e-9
