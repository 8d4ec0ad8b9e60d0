"""Semantic pins for the round-11 batch-2 operators (dataops18)."""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module", autouse=True)
def _load():
    from stockmarketdata_dwb_etl_spark.registry import load_all

    load_all()


def _run(spark, name):
    from stockmarketdata_dwb_etl_spark.registry import QUERIES

    return QUERIES[name](spark, SF_DIR).collect()


def test_mann_kendall_s_bounds_and_trend(spark):
    rows = _run(spark, "q_mann_kendall")
    assert rows
    for r in rows:
        n = r["n_days"]
        max_s = n * (n - 1) // 2
        assert -max_s <= r["s_stat"] <= max_s
        assert r["var_s"] > 0
        expect = "up" if r["s_stat"] > 0 else ("down" if r["s_stat"] < 0 else "flat")
        assert r["trend"] == expect
        if r["z_stat"] is not None and r["s_stat"] != 0:
            assert (r["z_stat"] > 0) == (r["s_stat"] > 0)


def test_kneser_ney_ll_negative_and_bounded(spark):
    rows = _run(spark, "q_kneser_ney_lm")
    assert rows
    for r in rows:
        # log-probabilities: strictly negative, floored at ln(1e-10)
        assert math.log(1e-10) - 1e-9 <= r["mean_ll"] < 0
        assert 0 <= r["n_unseen_ctx"] <= r["n_bigrams"]


def test_ppr_mass_concentrates_on_seed(spark):
    rows = _run(spark, "q_ppr_seed")
    assert len(rows) == 10
    ranks = [r["ppr"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    # the seed (lexicographically-first brand) keeps the restart mass:
    # it must appear in the top-10 and hold a rank >= the restart prob
    from stockmarketdata_dwb_etl_spark.queries.dataops18 import _PPR_RESTART

    seed = min(r["node"] for r in rows)  # seed is lexicographic min overall
    seed_rank = [r["ppr"] for r in rows if r["node"] == seed]
    assert seed_rank and seed_rank[0] >= _PPR_RESTART - 1e-9
    assert all(v >= 0 for v in ranks)


def test_hampel_counts_consistent(spark):
    rows = _run(spark, "q_hampel_filter")
    assert rows
    for r in rows:
        assert 0 <= r["n_outliers"] <= r["n_windows"]
        if r["n_outliers"] > 0:
            assert r["max_spike"] is not None and r["max_spike"] > 0
        else:
            assert r["max_spike"] is None


def test_js_divergence_bounds_and_symmetric_pairs(spark):
    rows = _run(spark, "q_js_divergence")
    assert rows
    ln2 = math.log(2.0)
    seen = set()
    for r in rows:
        assert -1e-9 <= r["js_divergence"] <= ln2 + 1e-9
        assert r["source_a"] < r["source_b"]
        seen.add((r["source_a"], r["source_b"]))
    # all unordered pairs exactly once
    srcs = sorted({s for p in seen for s in p})
    assert len(seen) == len(srcs) * (len(srcs) - 1) // 2


def test_intrinsic_dim_positive_and_below_ambient(spark):
    rows = _run(spark, "q_intrinsic_dim")
    assert len(rows) == 1
    r = rows[0]
    assert r["n_probes"] > 0
    assert r["mean_mu"] > 0
    assert 0 < r["id_twonn"] < 200  # sane estimate; ambient dim is 64
