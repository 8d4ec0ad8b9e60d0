"""Property tests for the round-3 finance / stats / corpus / graph
batches: indicator math vs independent pandas/numpy computation, test-
statistic invariants, containment-by-construction, and graph symmetry.

These assert the MATH on the fixture tables (sf0.001) independently of
the DuckDB differential gate in tests/test_oracle.py.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all
from tests.conftest import SF_DIR

load_all()


def test_macd_matches_pandas_ewm(spark):
    out = QUERIES["q_macd"](spark, SF_DIR).toPandas()
    one = out[out.symbol == out.symbol.iloc[0]].sort_values("bar_ts")
    close = one["close"].reset_index(drop=True)
    e12 = close.ewm(span=12, adjust=False).mean()
    e26 = close.ewm(span=26, adjust=False).mean()
    macd = e12 - e26
    # signal seeds at 0 (= first macd value, which is 0 by construction)
    sig = macd.ewm(span=9, adjust=False).mean()
    assert np.allclose(one["macd"].values, (macd).round(4).values, atol=1e-4)
    assert np.allclose(one["signal"].values, sig.round(4).values, atol=1e-4)


def test_rsi_bounds_and_window(spark):
    out = QUERIES["q_rsi"](spark, SF_DIR).toPandas()
    assert len(out) > 0
    assert (out.rsi14 >= 0).all() and (out.rsi14 <= 100).all()


def test_log_returns_cumulative_identity(spark):
    out = QUERIES["q_log_returns"](spark, SF_DIR).toPandas()
    one = out[out.symbol == out.symbol.iloc[0]].sort_values("bar_ts")
    # cum_growth_t = exp(sum of log returns) == prod of ratios == c_t / c_0
    # (c_0 = the close BEFORE the first emitted return row)
    ratio = one["cum_growth"].iloc[-1] / one["cum_growth"].iloc[0]
    expect = one["close"].iloc[-1] / one["close"].iloc[0]
    assert math.isclose(ratio, expect, rel_tol=1e-3)


def test_gini_matches_numpy(spark):
    out = QUERIES["q_gini"](spark, SF_DIR).toPandas().iloc[0]
    import duckdb

    rev = (
        duckdb.sql(
            f"SELECT SUM(o_totalprice) r FROM "
            f"read_parquet('{SF_DIR}/orders.parquet') GROUP BY o_custkey"
        )
        .fetchdf()["r"]
        .sort_values()
        .values
    )
    n = len(rev)
    i = np.arange(1, n + 1)
    gini = 2 * (i * rev).sum() / (n * rev.sum()) - (n + 1) / n
    assert out.n_customers == n
    assert math.isclose(out.gini, gini, abs_tol=1e-4)
    assert 0 <= out.gini < 1


def test_chi_square_nonnegative_and_dof(spark):
    out = QUERIES["q_chi_square"](spark, SF_DIR).toPandas().iloc[0]
    assert out.chi2 >= 0
    assert out.dof == 4  # (5 event types - 1) * (2 weekend flags - 1)


def test_benford_shares_sum_to_one(spark):
    out = QUERIES["q_benford"](spark, SF_DIR).toPandas()
    assert set(out.d) <= set(range(1, 10))
    assert math.isclose(out.obs_share.sum(), 1.0, abs_tol=1e-3)
    assert math.isclose(out.benford_share.sum(), 1.0, abs_tol=1e-3)


def test_welch_matches_numpy(spark):
    out = QUERIES["q_ttest_welch"](spark, SF_DIR).toPandas().iloc[0]
    import duckdb

    df = duckdb.sql(
        f"SELECT event_type, value FROM "
        f"read_parquet('{SF_DIR}/events.parquet') "
        f"WHERE event_type IN ('click','purchase')"
    ).fetchdf()
    a = df[df.event_type == "click"].value.values
    b = df[df.event_type == "purchase"].value.values
    se = a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se)
    assert math.isclose(out.t_stat, t, abs_tol=1e-3)
    assert min(len(a), len(b)) - 1 <= out.welch_dof <= len(a) + len(b) - 2


def test_containment_is_total_for_prefix_snippets(spark):
    out = QUERIES["q_containment"](spark, SF_DIR).toPandas()
    assert len(out) > 0
    # a snippet's word sequence is a prefix of the original, so every
    # snippet shingle exists in the original: containment must be exactly 1
    assert (out.containment == 1.0).all()
    # while symmetric Jaccard stays well below 1 for 40% snippets
    assert (out.jaccard < 1.0).all()


def test_zipf_slope_negative_good_fit(spark):
    out = QUERIES["q_zipf_slope"](spark, SF_DIR).toPandas().iloc[0]
    assert out.zipf_slope < 0
    assert 0 <= out.r2 <= 1


def test_common_neighbors_jaccard_bounds(spark):
    out = QUERIES["q_common_neighbors"](spark, SF_DIR).toPandas()
    assert len(out) > 0
    assert (out.jaccard > 0).all() and (out.jaccard <= 1).all()
    # pair ordering contract
    assert (out.supp_a < out.supp_b).all()


def test_grouping_id_totals_consistent(spark):
    out = QUERIES["q_grouping_id"](spark, SF_DIR).toPandas()
    grand = out[out.gid == 3]
    assert len(grand) == 1
    base = out[out.gid == 0]
    assert base.n_rows.sum() == grand.n_rows.iloc[0]
    assert math.isclose(
        base.sum_qty.sum(), grand.sum_qty.iloc[0], rel_tol=1e-9
    )


def test_hist2d_covers_all_rows(spark):
    out = QUERIES["q_hist2d"](spark, SF_DIR).toPandas()
    import duckdb

    total = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchone()[0]
    assert out.n.sum() == total
    assert out.value_bin.between(0, 9).all()
    assert out.hour_of_day.between(0, 23).all()


def test_forecast_linear_matches_numpy(spark):
    out = QUERIES["q_forecast_linear"](spark, SF_DIR).toPandas()
    bars = QUERIES["q_index_rebase"](spark, SF_DIR).toPandas()
    sym = out.symbol.iloc[0]
    series = bars[bars.symbol == sym].sort_values("bar_ts")["close"].values
    rn = np.arange(1, len(series) + 1, dtype=float)
    slope, icept = np.polyfit(rn, series, 1)
    got = out[(out.symbol == sym) & (out.horizon == 1)].forecast.iloc[0]
    expect = icept + slope * (len(series) + 1)
    assert math.isclose(got, expect, rel_tol=1e-3)


def test_index_rebase_starts_at_100(spark):
    out = QUERIES["q_index_rebase"](spark, SF_DIR).toPandas()
    firsts = out.sort_values("bar_ts").groupby("symbol").first()
    assert (firsts.idx100 == 100.0).all()


def test_outlier_iqr_fences_ordered(spark):
    out = QUERIES["q_outlier_iqr"](spark, SF_DIR).toPandas()
    assert (out.fence_lo < out.fence_hi).all()
    assert (out.n_outliers < out.n_rows).all()


def test_ab_test_sign_consistent(spark):
    out = QUERIES["q_ab_test_proportions"](spark, SF_DIR).toPandas().iloc[0]
    assert (out.z_stat > 0) == (out.p_weekend > out.p_weekday)
    assert 0 <= out.p_weekend <= 1 and 0 <= out.p_weekday <= 1


def test_one_hot_exactly_one(spark):
    # onehot is a '010…0' bit STRING (r09 output contract: top-level
    # array columns break the driver's pandas-sort canonicalizer)
    out = QUERIES["q_one_hot_encode"](spark, SF_DIR).toPandas()
    assert len(out) > 0
    assert out.onehot.apply(lambda s: s.count("1")).eq(1).all()
    assert out.onehot.str.fullmatch("[01]+").all()
    n_types = out.type_idx.max()
    assert out.onehot.apply(len).eq(n_types).all()
    # the hot position is the type index
    assert out.apply(
        lambda r: r.onehot[r.type_idx - 1] == "1", axis=1
    ).all()


def test_seasonal_profile_zero_mean(spark):
    out = QUERIES["q_seasonal_decompose"](spark, SF_DIR).toPandas()
    bars = QUERIES["q_index_rebase"](spark, SF_DIR).toPandas()
    # residuals average ≈ 0 across the seasonal profile (weighted by
    # n_obs), relative to the series level — the centered-MA detrend
    # leaves only noise-scale mean residual
    for sym, g in out.groupby("symbol"):
        m = (g.seasonal * g.n_obs).sum() / g.n_obs.sum()
        level = bars[bars.symbol == sym].close.mean()
        assert abs(m) < 0.05 * level  # ~150 obs/symbol at sf0.001


def test_blocked_edit_symmetric_contract(spark):
    out = QUERIES["q_dedup_blocked_edit"](spark, SF_DIR).toPandas()
    assert (out.id_a < out.id_b).all()
    assert (out.edit_dist >= 0).all() and (out.edit_dist <= 24).all()


def test_binaryfile_sizes_all_ok(spark):
    out = QUERIES["q_binaryfile_source"](spark, SF_DIR).toPandas()
    assert len(out) > 0
    assert out.size_ok.all()
    # payload hex starts with the MEDIA magic
    assert out.payload_hex.str.startswith("4D45444941").all()
