"""Property tests for the round-3 risk/benchmark indicator batch
(finance2.py): indicator math vs independent pandas/numpy computation.

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


def _one_symbol(out: pd.DataFrame) -> pd.DataFrame:
    return (
        out[out.symbol == out.symbol.iloc[0]]
        .sort_values("bar_ts")
        .reset_index(drop=True)
    )


def test_atr_matches_pandas_rolling(spark):
    out = QUERIES["q_atr"](spark, SF_DIR).toPandas()
    one = _one_symbol(out)
    # the emitted true_range re-averaged over a 14-row window must equal
    # atr14 (rows are contiguous from rn=14 => window fully formed from
    # index 13 of the emitted slice onward)
    recomputed = one["true_range"].rolling(14).mean()
    got = one["atr14"].iloc[13:]
    assert np.allclose(got.values, recomputed.iloc[13:].round(4).values, atol=2e-4)
    assert (out["true_range"] >= 0).all()


def test_stochastic_bounds_and_smoothing(spark):
    out = QUERIES["q_stochastic"](spark, SF_DIR).toPandas()
    assert len(out) > 0
    assert (out.pct_k >= 0).all() and (out.pct_k <= 100).all()
    assert (out.pct_d >= 0).all() and (out.pct_d <= 100).all()
    one = _one_symbol(out)
    # %D re-averaged from emitted %K matches from the 3rd emitted row on
    recomputed = one["pct_k"].rolling(3).mean()
    assert np.allclose(
        one["pct_d"].iloc[2:].values, recomputed.iloc[2:].values, atol=2e-4
    )


def test_obv_matches_pandas_cumsum(spark):
    out = QUERIES["q_obv"](spark, SF_DIR).toPandas()
    one = _one_symbol(out)
    # direction of OBV steps must follow close-to-close direction
    dobv = one["obv"].diff().iloc[1:]
    dclose = one["close"].diff().iloc[1:]
    up = dclose > 0
    down = dclose < 0
    assert (dobv[up] > 0).all()
    assert (dobv[down] < 0).all()
    assert (dobv[~(up | down)] == 0).all()
    assert one["obv"].iloc[0] == 0


def test_beta_matches_numpy_polyfit(spark):
    out = QUERIES["q_beta_capm"](spark, SF_DIR).toPandas()
    assert len(out) == 5
    # recompute returns + equal-weight market independently in pandas
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["bar_ts"] = ev["ts"].dt.floor("h")
    key = (
        ev["ts"].astype("int64").astype("string").str.zfill(20)
        + "-"
        + ev["event_id"].astype("string").str.zfill(12)
    )
    ev = ev.assign(__k=key).sort_values("__k")
    bars = ev.groupby(["event_type", "bar_ts"]).last()["value"].rename("close")
    rets = (
        bars.groupby(level=0).pct_change().dropna().rename("r").reset_index()
    )
    mkt = rets.groupby("bar_ts")["r"].mean().rename("rm")
    j = rets.merge(mkt, on="bar_ts")
    for _, row in out.iterrows():
        sub = j[j.event_type == row["symbol"]]
        beta = np.polyfit(sub["rm"], sub["r"], 1)[0]
        assert math.isclose(row["beta"], beta, rel_tol=1e-3, abs_tol=1e-4)


def test_sharpe_matches_numpy(spark):
    out = QUERIES["q_sharpe"](spark, SF_DIR).toPandas()
    assert len(out) == 5
    for _, row in out.iterrows():
        if row["sharpe_ann"] is None or pd.isna(row["sharpe_ann"]):
            continue
        expect = row["mean_r"] / row["vol"] * math.sqrt(8760.0)
        assert math.isclose(row["sharpe_ann"], expect, rel_tol=1e-3)


def test_autocorr_in_bounds(spark):
    out = QUERIES["q_autocorr"](spark, SF_DIR).toPandas()
    assert len(out) == 5
    ok = out["acf1"].dropna()
    assert ((ok >= -1.0) & (ok <= 1.0)).all()


def test_bfs_source_zero_and_unit_steps(spark):
    out = QUERIES["q_bfs_distance"](spark, SF_DIR).toPandas()
    assert len(out) > 0
    # exactly one source at distance 0, and it is the smallest node
    zeros = out[out.dist == 0]
    assert len(zeros) == 1
    assert zeros.iloc[0]["node"] == out["node"].min()
    # hop distances are a contiguous ladder from 0 (BFS frontier property)
    ds = sorted(out["dist"].unique())
    assert ds == list(range(len(ds)))
    assert max(ds) <= 4


def test_partial_agg_merge_equals_direct(spark):
    out = QUERIES["q_partial_agg_merge"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    direct = ev.groupby("event_type")["value"].agg(["count", "sum", "min", "max"])
    for _, row in out.iterrows():
        d = direct.loc[row["symbol"]]
        assert row["total_cnt"] == d["count"]
        assert math.isclose(row["total_value"], round(d["sum"], 4), abs_tol=1e-3)
        assert row["vmin"] == d["min"] and row["vmax"] == d["max"]


def test_percentile_cont_matches_numpy(spark):
    out = QUERIES["q_percentile_cont"](spark, SF_DIR).toPandas()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    for flag, grp in li.groupby("l_returnflag"):
        for p in (0.25, 0.5, 0.75):
            expect = np.percentile(grp["l_extendedprice"], p * 100)
            got = out[(out.l_returnflag == flag) & (out.p == p)][
                "price_quantile"
            ].iloc[0]
            assert math.isclose(got, expect, rel_tol=1e-6, abs_tol=1e-3)


def test_cross_corpus_finds_planted_contamination(spark):
    out = QUERIES["q_dedup_cross_corpus"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    planted_src = docs[docs.doc_id % 14 == 0]["doc_id"]
    # every planted near-copy (id+2M) must be flagged against its origin
    for orig in planted_src:
        hit = out[(out.corpus_id == orig + 2_000_000) & (out.holdout_id == orig)]
        assert len(hit) == 1, f"planted contamination {orig} not flagged"
        assert hit.iloc[0]["jaccard"] >= 0.7
    # side rule: corpus ids never %7==0 (planted ids shift off the class)
    assert (out.holdout_id % 7 == 0).all()
    assert (out.corpus_id % 7 != 0).all()


def test_quality_classifier_partitions_corpus(spark):
    out = QUERIES["q_quality_classifier"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    n_eligible = len(docs[(docs.text.str.len() > 0)])
    assert out["n_docs"].sum() == n_eligible
    assert out["bucket"].between(0, 9).all()
    # bucket means must sit inside their decile bounds
    for _, row in out.iterrows():
        assert row["bucket"] / 10 - 1e-9 <= row["avg_score"]
        assert row["avg_score"] <= (row["bucket"] + 1) / 10 + 1e-9 or row[
            "bucket"
        ] == 9


def test_agg_filtered_matches_pandas(spark):
    out = QUERIES["q_agg_filtered"](spark, SF_DIR).toPandas()
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    for _, row in out.iterrows():
        g = o[o.o_orderpriority == row["o_orderpriority"]]
        assert row["n_orders"] == len(g)
        assert row["n_high"] == (g.o_totalprice > 150000).sum()
        assert math.isclose(
            row["open_revenue"],
            round(g[g.o_orderstatus == "O"].o_totalprice.sum(), 4),
            abs_tol=1e-2,
        )
        y1996 = g[pd.to_datetime(g.o_orderdate).dt.year == 1996]
        assert row["custs_1996"] == y1996.o_custkey.nunique()


def test_global_median_matches_numpy(spark):
    out = QUERIES["q_global_median"](spark, SF_DIR).toPandas()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    assert (out["n"] == len(li)).all()
    for p in (0.25, 0.5, 0.75):
        expect = np.percentile(li["l_extendedprice"], p * 100)
        got = out[out.p == p]["price_quantile"].iloc[0]
        assert math.isclose(got, expect, rel_tol=1e-9, abs_tol=1e-3)


def test_hll_union_rollup_within_bound(spark):
    out = QUERIES["q_hll_union_rollup"](spark, SF_DIR).toPandas()
    assert len(out) == 5
    assert out["union_ok"].all()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    exact = ev.groupby("event_type")["user_id"].nunique()
    months = ev.assign(m=ev.ts.dt.to_period("M")).groupby("event_type")["m"].nunique()
    for _, row in out.iterrows():
        assert row["exact_users"] == exact[row["event_type"]]
        assert row["n_month_sketches"] == months[row["event_type"]]


def test_attribution_shares_sum_to_one(spark):
    out = QUERIES["q_attribution_last_touch"](spark, SF_DIR).toPandas()
    assert math.isclose(out["share"].sum(), 1.0, abs_tol=1e-4)
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    assert out["n_conversions"].sum() == (ev.event_type == "purchase").sum()
    assert set(out["channel"]) <= {"view", "click", "signup", "direct"}


def test_text_source_roundtrip_lossless(spark):
    out = QUERIES["q_text_source_lines"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    direct = docs.groupby("source").agg(
        n=("doc_id", "size"),
        chars=("text", lambda s: s.str.len().sum()),
        mx=("doc_id", "max"),
    )
    for _, row in out.iterrows():
        d = direct.loc[row["source"]]
        assert row["n_docs"] == d["n"]
        assert row["total_chars"] == d["chars"]
        assert row["max_doc_id"] == d["mx"]


def test_pseudonymize_tokens_deterministic_and_banded(spark):
    import hashlib

    out = QUERIES["q_pseudonymize"](spark, SF_DIR).toPandas()
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    assert len(out) == len(c)
    row = out.iloc[0]
    name = c[c.c_custkey == row["c_custkey"]].iloc[0]["c_name"]
    expect = hashlib.sha256(f"pepper1{name}".encode()).hexdigest()
    assert row["name_token"] == expect
    assert row["short_token"] == expect[:8]
    assert (out["acctbal_band"] % 100 == 0).all()
    # tokens must stay unique per distinct name (join-stability)
    assert out["name_token"].nunique() == c["c_name"].nunique()


def test_ri_audit_finds_exactly_planted_orphans(spark):
    out = QUERIES["q_ri_audit"](spark, SF_DIR).toPandas().set_index("check_name")
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li_n = len(pd.read_parquet(f"{SF_DIR}/lineitem.parquet"))
    planted = (o.o_orderkey % 1000 == 0).sum()
    assert out.loc["orders.custkey->customer", "n_orphans"] == planted
    assert out.loc["orders.custkey->customer", "n_checked"] == len(o) + planted
    for edge in (
        "lineitem.orderkey->orders",
        "lineitem.partkey->part",
        "lineitem.suppkey->supplier",
    ):
        assert out.loc[edge, "n_orphans"] == 0
        assert out.loc[edge, "n_checked"] == li_n


def test_multimodal_dedup_counts_planted_copies(spark):
    out = QUERIES["q_multimodal_dedup"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    assert out["n_blobs"].sum() == len(docs) + (docs.doc_id % 9 == 0).sum()
    # every planted copy is a duplicate row; naturals may add more
    assert out["n_dup_rows"].sum() >= (docs.doc_id % 9 == 0).sum()
    assert (out["n_blobs"] == out["n_unique"] + out["n_dup_rows"]).all()
    assert (out["bytes_saved"] >= out["n_dup_rows"]).all()  # docs nonempty


def test_embed_norm_audit_matches_numpy(spark):
    out = QUERIES["q_embed_norm_audit"](spark, SF_DIR).toPandas().iloc[0]
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    norms = emb["embedding"].apply(
        lambda v: math.sqrt(float(np.sum(np.asarray(v, dtype=np.float64) ** 2)))
    )
    assert out["n_vecs"] == len(emb)
    assert out["min_dim"] == out["max_dim"] == 64
    assert out["n_zero"] == int((norms < 1e-12).sum())
    assert math.isclose(out["avg_norm"], norms.round(6).mean(), abs_tol=1e-3)
    assert math.isclose(out["min_norm"], norms.min(), abs_tol=1e-3)
    assert math.isclose(out["max_norm"], norms.max(), abs_tol=1e-3)


def test_stream_ohlc_matches_finalized_batch_bars(spark):
    out = QUERIES["q_stream_ohlc"](spark, SF_DIR).toPandas()
    batch = QUERIES["q_ohlc_resample"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    horizon = ev.ts.max() - pd.Timedelta(minutes=10)
    # streamed bars = exactly the batch bars whose window closed before
    # the final watermark
    assert len(out) > 0
    assert (pd.to_datetime(out["window_end"]) <= horizon).all()
    merged = out.merge(
        batch,
        left_on=["symbol", "window_start"],
        right_on=["event_type", "bar_ts"],
        how="left",
        suffixes=("", "_b"),
    )
    assert merged["event_type"].notna().all()
    for col in ("open", "high", "low", "close"):
        assert np.allclose(merged[col], merged[f"{col}_b"], atol=1e-4)


def test_token_budget_trim_respects_budget_and_ranking(spark):
    out = QUERIES["q_token_budget_trim"](spark, SF_DIR).toPandas()
    scored = QUERIES["q_quality_classifier"](spark, SF_DIR)  # noqa: F841
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    total_tokens = (
        docs.text.str.split(" ").apply(lambda w: sum(1 for x in w if x))
    ).sum()
    budget = math.ceil(0.25 * total_tokens)
    kept_tokens = out["tokens_kept"].sum()
    assert kept_tokens <= budget
    # greedy prefix: adding any single excluded doc must overflow —
    # kept tokens land within max-doc-size of the budget
    max_doc = (
        docs.text.str.split(" ").apply(lambda w: sum(1 for x in w if x)).max()
    )
    assert kept_tokens > budget - max_doc
    assert (out["avg_score"] > 0).all() and (out["avg_score"] <= 1).all()


def test_pipeline_incremental_equals_full_run(spark):
    out = (
        QUERIES["q_pipeline_incremental"](spark, SF_DIR)
        .toPandas()
        .set_index("merge_action")
    )
    full = QUERIES["q_stock_pipeline"](spark, SF_DIR).toPandas()
    # merged row count across actions == full-run silver row count
    assert out["n_rows"].sum() == len(full)
    assert set(out.index) == {"kept", "updated", "inserted"}
    # price mass is conserved: per-action sums reassemble the full total
    assert math.isclose(
        out["sum_price"].sum(), round(full["Price"].sum(), 2), abs_tol=0.05
    )


def test_cluster_purity_matches_sklearn_free_recompute(spark):
    out = QUERIES["q_cluster_purity"](spark, SF_DIR).toPandas().iloc[0]
    cm = (
        QUERIES["q_kmeans_assign"](spark, SF_DIR)
        .toPandas()
        .pivot_table(index="label", columns="assigned", values="n", fill_value=0)
    )
    n = cm.values.sum()
    assert out["n_vecs"] == n
    purity = cm.values.max(axis=0).sum() / n
    assert math.isclose(out["purity"], purity, abs_tol=1e-4)
    p = cm.values / n
    pl, pc = p.sum(axis=1), p.sum(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        mi = np.nansum(p * np.log(p / np.outer(pl, pc)))
        hl = -np.sum(pl * np.log(pl))
        hc = -np.sum(pc * np.log(pc))
    assert math.isclose(out["nmi"], mi / math.sqrt(hl * hc), abs_tol=1e-4)
    assert 0 <= out["nmi"] <= 1 + 1e-9 and 0 < out["purity"] <= 1


def test_jarque_bera_matches_scipy_free_formula(spark):
    out = QUERIES["q_jarque_bera"](spark, SF_DIR).toPandas()
    # recompute returns independently and check one symbol's moments
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["bar_ts"] = ev["ts"].dt.floor("h")
    key = (
        ev["ts"].astype("int64").astype("string").str.zfill(20)
        + "-"
        + ev["event_id"].astype("string").str.zfill(12)
    )
    bars = (
        ev.assign(__k=key)
        .sort_values("__k")
        .groupby(["event_type", "bar_ts"])
        .last()["value"]
    )
    for sym in out.symbol:
        r = bars.loc[sym].pct_change().dropna().values
        m2, m3, m4 = [np.mean((r - r.mean()) ** k) for k in (2, 3, 4)]
        skew, exk = m3 / m2**1.5, m4 / m2**2 - 3
        row = out[out.symbol == sym].iloc[0]
        assert math.isclose(row["skewness"], skew, abs_tol=1e-3)
        assert math.isclose(row["excess_kurtosis"], exk, abs_tol=1e-3)
        jb = len(r) / 6 * (skew**2 + exk**2 / 4)
        assert math.isclose(row["jb_stat"], jb, rel_tol=1e-3)


def test_rank_ic_bounds(spark):
    out = QUERIES["q_rank_ic"](spark, SF_DIR).toPandas().iloc[0]
    assert out["n_dates"] > 0
    assert -1.0 <= out["mean_ic"] <= 1.0
    assert 0 <= out["n_positive"] <= out["n_dates"]


def test_amihud_positive(spark):
    out = QUERIES["q_amihud_illiquidity"](spark, SF_DIR).toPandas()
    assert len(out) == 5
    assert (out["amihud_x1e6"] > 0).all()


def test_dedup_chunks_planted_copies_retain_zero(spark):
    out = QUERIES["q_dedup_chunks"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    planted = out[out.doc_id >= 4_000_000]
    assert len(planted) == (docs.doc_id % 11 == 0).sum()
    assert (planted["n_retained"] == 0).all()
    assert (planted["retained_ratio"] == 0).all()
    originals = out[out.doc_id < 4_000_000]
    # chunk math: each original doc yields ceil(words/10) chunks
    nw = docs.set_index("doc_id").text.str.split(" ").apply(
        lambda w: sum(1 for x in w if x)
    )
    for did, row in originals.set_index("doc_id").head(20).iterrows():
        assert row["n_chunks"] == math.ceil(nw[did] / 10)


def test_twap_between_min_max_price(spark):
    out = QUERIES["q_twap"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    for _, row in out.iterrows():
        vals = ev[ev.event_type == row["symbol"]]["value"]
        assert vals.min() <= row["twap"] <= vals.max()
        # spans sum: total_us equals last-first per symbol
        ts = ev[ev.event_type == row["symbol"]]["ts"]
        span = (ts.max() - ts.min()) // pd.Timedelta(microseconds=1)
        assert row["total_us"] == span


def test_target_encoding_shrinks_toward_prior(spark):
    out = QUERIES["q_target_encoding"](spark, SF_DIR).toPandas()
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    mu = o.o_totalprice.mean()
    for _, row in out.iterrows():
        lo, hi = sorted((row["raw_mean"], mu))
        assert lo - 1e-6 <= row["encoded"] <= hi + 1e-6


def test_scd2_integrity_counts_planted_overlaps(spark):
    out = QUERIES["q_scd2_integrity"](spark, SF_DIR).toPandas().iloc[0]
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    n17 = (c.c_custkey % 17 == 0).sum()
    n13 = (c.c_custkey % 13 == 0).sum()
    n_both = ((c.c_custkey % 17 == 0) & (c.c_custkey % 13 == 0)).sum()
    assert out["n_keys"] == len(c)
    assert out["n_versions"] == len(c) + n13 + n17
    # every planted row overlaps once; keys with both a migration AND a
    # planted row add a second overlap (open row vs planted window)
    assert out["overlap_violations"] == n17 + n_both
    assert out["keys_with_overlap"] == n17
    assert out["keys_bad_current"] == 0  # planted rows are not current


def test_survival_curve_monotone_and_anchored(spark):
    out = (
        QUERIES["q_survival_churn"](spark, SF_DIR)
        .toPandas()
        .sort_values("tenure_months")
    )
    assert len(out) > 0
    s = out["survival"].values
    assert (np.diff(s) <= 1e-9).all(), "survival must be non-increasing"
    assert 0 <= s[-1] <= s[0] <= 1.0
    # risk set is the reverse cumulative of curve membership
    assert (np.diff(out["n_at_risk"].values) <= 0).all()
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    assert out["n_at_risk"].iloc[0] == o.o_custkey.nunique()
    assert (out["n_churned"] <= out["n_at_risk"]).all()


def test_cohort_ltv_monotone_and_total(spark):
    out = QUERIES["q_cohort_ltv"](spark, SF_DIR).toPandas()
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    # cumulative LTV is non-decreasing within each cohort
    for _, grp in out.groupby("cohort"):
        g = grp.sort_values("age")
        assert (g["ltv_x10000"].diff().dropna() >= 0).all()
    # final LTV mass reassembles total revenue: sum over cohorts of
    # (last cum_ltv * cohort_size / 1e4) == total order revenue
    last = out.sort_values("age").groupby("cohort").last()
    total = (last["ltv_x10000"] / 1e4 * last["cohort_size"]).sum()
    assert math.isclose(total, o.o_totalprice.sum(), rel_tol=1e-5)


def test_embedding_drift_small_for_random_halves(spark):
    out = QUERIES["q_embedding_drift"](spark, SF_DIR).toPandas().iloc[0]
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    M = np.stack(emb.embedding.values).astype(np.float64)
    side = (emb.vec_id % 2 == 0).values
    shift = M[side].mean(axis=0) - M[~side].mean(axis=0)
    assert out["n_dims"] == M.shape[1]
    assert math.isclose(
        out["centroid_shift_l2"], np.sqrt((shift**2).sum()), abs_tol=1e-4
    )
    assert math.isclose(
        out["max_dim_shift"], np.abs(shift).max(), abs_tol=1e-4
    )


def test_asof_nearest_matches_pandas_merge_asof(spark):
    out = QUERIES["q_join_asof_nearest"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    clicks = (
        ev[ev.event_type == "click"][["user_id", "ts", "event_id"]]
        .sort_values("ts")
        .reset_index(drop=True)
    )
    purchases = (
        ev[ev.event_type == "purchase"][["user_id", "ts", "event_id"]]
        .rename(columns={"event_id": "p_id"})
        .sort_values("ts")
        .reset_index(drop=True)
    )
    merged = pd.merge_asof(
        clicks, purchases, on="ts", by="user_id", direction="nearest"
    )
    got = out.set_index("event_id")["nearest_purchase_id"]
    # pandas breaks exact-distance ties toward backward as we do; compare
    # full match set
    for _, row in merged.iterrows():
        g = got[row["event_id"]]
        if pd.isna(row["p_id"]):
            assert pd.isna(g)
        else:
            assert g == row["p_id"], row["event_id"]


def test_active_users_matches_pandas(spark):
    out = QUERIES["q_active_users"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["d"] = ev.ts.dt.date
    dau = ev.groupby("d")["user_id"].nunique()
    for _, row in out.iterrows():
        d = row["day"]
        assert row["dau"] == dau[d]
        wnd = ev[(ev.d > d - pd.Timedelta(days=7)) & (ev.d <= d)]
        assert row["wau"] == wnd["user_id"].nunique()
        assert row["dau"] <= row["wau"]
        expect = round(10000 * row["dau"] / row["wau"])
        assert abs(row["stickiness_x10000"] - expect) <= 1


def test_holt_forecast_is_linear_in_h(spark):
    out = QUERIES["q_forecast_holt"](spark, SF_DIR).toPandas()
    assert set(out["h"]) == set(range(1, 7))
    for sym, grp in out.groupby("symbol"):
        g = grp.sort_values("h")["forecast"].values
        steps = np.diff(g)
        # l + h*b is linear in h: constant step == trend b
        assert np.allclose(steps, steps[0], atol=2e-4), sym


def test_audience_overlap_matches_pandas_sets(spark):
    out = QUERIES["q_audience_overlap"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    users = {t: set(g.user_id) for t, g in ev.groupby("event_type")}
    assert len(out) == 10  # C(5,2)
    for _, row in out.iterrows():
        A, B = users[row["type_a"]], users[row["type_b"]]
        assert row["n_a"] == len(A) and row["n_b"] == len(B)
        assert row["n_both"] == len(A & B)
        expect = round(10000 * len(A & B) / len(A | B))
        assert abs(row["jaccard_x10000"] - expect) <= 1


def test_lead_lag_xcorr_symmetry_frame(spark):
    out = QUERIES["q_lead_lag_xcorr"](spark, SF_DIR).toPandas()
    assert list(out["lag"]) == list(range(-3, 4))
    ok = out["xcorr"].dropna()
    assert ((ok >= -1.0) & (ok <= 1.0)).all()
    # lag-0 n equals the co-occurring bar count of the two lead symbols
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["bar_ts"] = ev.ts.dt.floor("h")
    syms = sorted(ev.event_type.unique())[:2]
    bars = {
        s: set(ev[ev.event_type == s].bar_ts.unique()) for s in syms
    }
    # returns drop each symbol's first bar; co-bars is an upper bound
    n0 = out[out.lag == 0]["n"].iloc[0]
    assert n0 <= len(bars[syms[0]] & bars[syms[1]])
    assert n0 > 0


def test_csv_multiline_preserves_embedded_newlines(spark):
    out = QUERIES["q_csv_multiline"](spark, SF_DIR).toPandas()
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    expect = c.assign(
        note="seg: " + c.c_mktsegment + "\n" + "cust: " + c.c_name
    )
    direct = expect.groupby("c_mktsegment").agg(
        n=("c_custkey", "size"),
        chars=("note", lambda s: s.str.len().sum()),
        mx=("c_custkey", "max"),
    )
    for _, row in out.iterrows():
        d = direct.loc[row["c_mktsegment"]]
        assert row["n_rows"] == d["n"]
        assert row["total_note_chars"] == d["chars"]
        assert row["max_key"] == d["mx"]


def test_time_to_convert_percentiles_ordered(spark):
    out = QUERIES["q_time_to_convert"](spark, SF_DIR).toPandas().iloc[0]
    assert out["n_conversions"] > 0
    assert 0 <= out["p25_min"] <= out["p50_min"] <= out["p75_min"] <= out["max_min"]


def test_table_checksum_order_invariant_and_sensitive(spark):
    import hashlib

    out = QUERIES["q_table_checksum"](spark, SF_DIR).toPandas()
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")

    def fp(df):
        canon = (
            df.o_orderkey.astype(str)
            + "|"
            + df.o_custkey.astype(str)
            + "|"
            + df.o_orderstatus
            + "|"
            + pd.to_datetime(df.o_orderdate).dt.strftime("%Y-%m-%d")
        )
        return sum(
            int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in canon
        )

    for _, row in out.iterrows():
        g = o[o.o_orderpriority == row["o_orderpriority"]]
        assert row["n_rows"] == len(g)
        assert row["fingerprint"] == fp(g)
        # sensitivity: perturbing one key changes the fingerprint
        g2 = g.copy()
        g2.iloc[0, g2.columns.get_loc("o_custkey")] += 1
        assert fp(g2) != row["fingerprint"]
        break  # one group suffices for the perturbation check


def test_roc_auc_matches_sklearn_free_trapezoid(spark):
    out = QUERIES["q_roc_auc"](spark, SF_DIR).toPandas().iloc[0]
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    w = docs.text.str.split(" ").apply(lambda ws: [x for x in ws if x])
    n_words = w.str.len()
    ok = (n_words > 0) & (docs.text.str.len() > 0)
    stop = w.apply(
        lambda ws: sum(
            1 for x in ws if x in {"the", "a", "of", "and", "to", "in", "is"}
        )
    )
    awl = w.apply(lambda ws: sum(len(x) for x in ws)) / n_words
    digit = docs.text.str.count(r"[0-9]") / docs.text.str.len()
    z = (
        -2.0
        + 0.02 * np.minimum(n_words, 200)
        + 6.0 * (stop / n_words)
        - 8.0 * digit
        + 0.3 * awl
    )
    score = (1 / (1 + np.exp(-z))).round(6)[ok]
    y = (docs.lang == "en").astype(int)[ok]
    # Mann-Whitney AUC with tie correction via average ranks
    ranks = pd.Series(score).rank(method="average")
    n_pos, n_neg = y.sum(), (1 - y).sum()
    auc = (ranks[y.values == 1].sum() - n_pos * (n_pos + 1) / 2) / (
        n_pos * n_neg
    )
    assert out["n_pos"] == n_pos and out["n_neg"] == n_neg
    assert abs(out["auc_x10000"] - round(10000 * auc)) <= 1


def test_pr_curve_monotone_recall(spark):
    out = QUERIES["q_pr_curve"](spark, SF_DIR).toPandas().sort_values("threshold")
    # recall is non-increasing as the threshold rises; TP+FN constant
    rec = out["recall_x10000"].dropna().values
    assert (np.diff(rec) <= 0).all()
    assert out[["tp", "fn"]].sum(axis=1).nunique() == 1
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    assert out[["tp", "fn"]].sum(axis=1).iloc[0] == (docs.lang == "en").sum()


def test_calibration_bins_partition_and_bounds(spark):
    out = QUERIES["q_calibration_bins"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    assert out["n_docs"].sum() == len(docs[docs.text.str.len() > 0])
    assert (out["n_positive"] <= out["n_docs"]).all()
    # predicted mean must sit inside its decile band
    for _, row in out.iterrows():
        lo, hi = row["bin"] * 1000, (row["bin"] + 1) * 1000
        if row["bin"] == 9:
            hi = 10000
        assert lo - 1 <= row["predicted_rate_x10000"] <= hi + 1


def test_peak_concurrency_bounds(spark):
    out = QUERIES["q_peak_concurrency"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    assert len(out) == ev.ts.dt.date.nunique()
    # peak concurrency can never exceed that day's session count or the
    # user population, and is at least 1 on any day with sessions
    assert (out["peak_concurrent"] >= 1).all()
    assert (out["peak_concurrent"] <= out["n_sessions"]).all()
    assert (out["peak_concurrent"] <= ev.user_id.nunique()).all()


def test_lsh_tuning_curve_matches_formula(spark):
    out = QUERIES["q_lsh_tuning_curve"](spark, SF_DIR).toPandas()
    assert len(out) == 4 * 19
    for _, row in out.iterrows():
        expect = 1 - (1 - row["jaccard"] ** row["rows_per_band"]) ** row["bands"]
        assert math.isclose(row["p_candidate"], expect, abs_tol=1e-5)
    # S-curve: monotone increasing in j for the production config
    g = out[(out.bands == 16)].sort_values("jaccard")["p_candidate"].values
    assert (np.diff(g) >= -1e-12).all()
    # and the repo's chosen config gives ~certain recall at j=0.7
    p07 = out[(out.bands == 16) & (out.jaccard == 0.7)]["p_candidate"].iloc[0]
    assert p07 > 0.9999


def test_gram_matrix_matches_numpy(spark):
    out = QUERIES["q_gram_matrix"](spark, SF_DIR).toPandas()
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    M = np.stack(emb.embedding.values).astype(np.float64)
    G = M.T @ M
    assert len(out) == 64 * 65 // 2
    for _, row in out.head(200).iterrows():
        assert math.isclose(
            row["gram"], G[int(row["i"]) - 1, int(row["j"]) - 1], abs_tol=1e-4
        )
    # diagonal entries are squared norms — strictly positive
    diag = out[out.i == out.j]
    assert (diag["gram"] > 0).all() and len(diag) == 64


def test_vocab_coverage_levels_nested(spark):
    out = (
        QUERIES["q_vocab_coverage"](spark, SF_DIR)
        .toPandas()
        .set_index("coverage_pct")
    )
    assert list(out.index) == [50, 90, 99]
    # higher coverage needs at least as many words
    assert (
        out.loc[50, "n_words_needed"]
        <= out.loc[90, "n_words_needed"]
        <= out.loc[99, "n_words_needed"]
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    total = docs.text.str.split(" ").apply(
        lambda w: sum(1 for x in w if x)
    ).sum()
    assert (out["total_tokens"] == total).all()


def test_volume_profile_shares_sum(spark):
    out = QUERIES["q_volume_profile"](spark, SF_DIR).toPandas()
    for sym, g in out.groupby("symbol"):
        # integer-rounded shares reassemble ~10000 per symbol
        assert abs(g["share_x10000"].sum() - 10000) <= len(g)
        ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
        assert g["vol"].sum() == (ev.event_type == sym).sum()


def test_overnight_gaps_counts_consistent(spark):
    out = QUERIES["q_overnight_gaps"](spark, SF_DIR).toPandas()
    assert len(out) == 5
    assert (out["n_gap_up"] + out["n_gap_down"] <= out["n_days"]).all()
    assert (out["n_gaps_filled"] <= out["n_gap_up"] + out["n_gap_down"]).all()
    assert (out["avg_gap_bps"] >= 0).all()


def test_price_clustering_nesting(spark):
    out = QUERIES["q_price_clustering"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    for _, row in out.iterrows():
        vals = ev[ev.event_type == row["symbol"]]["value"]
        cents = (vals * 100).round().astype("int64")
        assert row["n_ticks"] == len(cents)
        assert row["n_whole"] == (cents % 100 == 0).sum()
        assert row["n_half"] == (cents % 50 == 0).sum()
        assert row["n_dime"] == (cents % 10 == 0).sum()
        # divisibility nests: wholes ⊆ halves ⊆ dimes
        assert row["n_whole"] <= row["n_half"] <= row["n_dime"]


def test_var_cvar_tail_relationship(spark):
    out = QUERIES["q_var_cvar"](spark, SF_DIR).toPandas()
    assert len(out) == 5
    # CVaR (tail mean) is at most VaR (tail boundary); ~5% tail mass
    assert (out["cvar95"] <= out["var95"] + 1e-9).all()
    share = out["n_tail"] / out["n"]
    assert ((share >= 0.04) & (share <= 0.12)).all()


def test_drawdown_duration_bounds(spark):
    out = QUERIES["q_drawdown_duration"](spark, SF_DIR).toPandas()
    assert len(out) == 5
    assert (out["longest_underwater_bars"] <= out["total_underwater_bars"]).all()
    assert (out["n_spells"] >= 1).all()
    assert (
        out["total_underwater_bars"]
        >= out["n_spells"] - 1 + out["longest_underwater_bars"]
    ).all()


def test_source_overlap_containment_bounds(spark):
    out = QUERIES["q_source_overlap"](spark, SF_DIR).toPandas()
    assert (out["n_shared"] >= 5).all()
    assert (out["n_shared"] <= out[["n_a", "n_b"]].min(axis=1)).all()
    assert (out["containment_x10000"] <= 10000).all()
    assert (out["source_a"] < out["source_b"]).all()


def test_dup_cluster_histogram_planted_waves(spark):
    out = (
        QUERIES["q_dup_cluster_histogram"](spark, SF_DIR)
        .toPandas()
        .set_index("cluster_size")
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    n6 = (docs.doc_id % 6 == 0).sum()
    n12 = (docs.doc_id % 12 == 0).sum()
    # both planted cluster sizes exist and the doc mass reassembles
    assert 2 in out.index and 3 in out.index
    assert out["n_docs"].sum() == len(docs) + n6 + n12
    assert (out["n_removable"] == (out.index - 1) * out["n_clusters"]).all()


def test_sla_lateness_matches_pandas(spark):
    out = QUERIES["q_sla_lateness"](spark, SF_DIR).toPandas()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    lag = (
        pd.to_datetime(j.l_shipdate) - pd.to_datetime(j.o_orderdate)
    ).dt.days
    for _, row in out.iterrows():
        m = j.o_orderpriority == row["o_orderpriority"]
        assert row["n_items"] == m.sum()
        assert row["n_late"] == (lag[m] > 90).sum()
        assert row["worst_lag_days"] == lag[m].max()
        assert row["total_excess_days"] == (lag[m][lag[m] > 90] - 90).sum()


def test_reactivation_gaps_verified(spark):
    out = QUERIES["q_reactivation"](spark, SF_DIR).toPandas()
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet").sort_values(
        ["o_custkey", "o_orderdate", "o_orderkey"]
    )
    midx = (
        pd.to_datetime(o.o_orderdate).dt.year * 12
        + pd.to_datetime(o.o_orderdate).dt.month
    )
    gaps = midx.groupby(o.o_custkey).diff()
    react = o[gaps >= 6]
    months = pd.to_datetime(react.o_orderdate).dt.to_period("M")
    expect = months.value_counts()
    assert out["n_reactivated"].sum() == len(react)
    for _, row in out.head(10).iterrows():
        p = pd.Period(row["month"], freq="M")
        assert row["n_reactivated"] == expect[p]


def test_kyle_lambda_sign_sanity(spark):
    out = QUERIES["q_kyle_lambda"](spark, SF_DIR).toPandas()
    assert len(out) == 5
    # signed volume moves WITH the return by construction (tick rule
    # signs on the same close diff), so the impact slope is positive
    assert (out["lambda_x1e6"].dropna() > 0).all()


def test_event_study_rows(spark):
    out = QUERIES["q_event_study_jumps"](spark, SF_DIR).toPandas()
    assert set(out["is_jump"]) <= {True, False}
    assert out["n_events"].sum() > 0
    # jumps are rare: the event bucket is far smaller than baseline
    if len(out) == 2:
        ev = out.set_index("is_jump")
        assert ev.loc[True, "n_events"] < ev.loc[False, "n_events"]


def test_arch_effect_bounds(spark):
    out = QUERIES["q_arch_effect"](spark, SF_DIR).toPandas()
    assert len(out) == 5
    ok = out.dropna()
    assert ((ok["acf1_sq"] >= -1) & (ok["acf1_sq"] <= 1)).all()
    assert np.allclose(
        ok["lm_stat"], ok["n"] * ok["acf1_sq"] ** 2, atol=1e-2
    )


def test_sortino_vs_sharpe_direction(spark):
    srt = QUERIES["q_sortino"](spark, SF_DIR).toPandas().set_index("symbol")
    shp = QUERIES["q_sharpe"](spark, SF_DIR).toPandas().set_index("symbol")
    for sym in srt.index:
        a, b = srt.loc[sym, "sortino_ann"], shp.loc[sym, "sharpe_ann"]
        if pd.notna(a) and pd.notna(b):
            # same numerator, different denominators: same sign always
            assert (a >= 0) == (b >= 0)
    assert (srt["downside_dev"] >= 0).all()
    assert (srt["n_down"] <= srt["n"]).all()


def test_hhi_exact_integer_formula(spark):
    out = QUERIES["q_hhi_concentration"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    vols = ev.event_type.value_counts()
    T = vols.sum()
    hhi = round(10000 * (vols**2).sum() / T**2)
    assert out["n_symbols"] == len(vols)
    assert abs(out["hhi_x10000"] - hhi) <= 1
    # HHI lower bound: 10000/n for perfectly even flow
    assert out["hhi_x10000"] >= 10000 // out["n_symbols"]
    assert abs(out["top_share_x10000"] - round(10000 * vols.max() / T)) <= 1


def test_roll_spread_model_gate(spark):
    out = QUERIES["q_roll_spread"](spark, SF_DIR).toPandas()
    assert len(out) == 5
    # spread is emitted iff serial covariance is negative
    neg = out["serial_cov"] < 0
    assert out.loc[neg, "roll_spread"].notna().all()
    assert out.loc[~neg, "roll_spread"].isna().all()
    ok = out.loc[neg]
    assert np.allclose(
        ok["roll_spread"], 2 * np.sqrt(-ok["serial_cov"]), atol=1e-4
    )


def test_rolling_beta_converges_to_static(spark):
    roll = QUERIES["q_rolling_beta"](spark, SF_DIR).toPandas()
    static = (
        QUERIES["q_beta_capm"](spark, SF_DIR).toPandas().set_index("symbol")
    )
    assert len(roll) > 0
    for sym, grp in roll.groupby("symbol"):
        vals = grp["beta100"].dropna()
        # rolling betas hover around the full-sample beta
        b = static.loc[sym, "beta"]
        assert vals.min() - 1.0 <= b <= vals.max() + 1.0


def test_anova_identity_and_nonnegativity(spark):
    out = QUERIES["q_anova_hod"](spark, SF_DIR).toPandas().iloc[0]
    assert out["k"] <= 24 and out["n"] > out["k"]
    assert out["ss_between"] >= -1e-9
    assert out["ss_within"] >= 0
    if pd.notna(out["f_stat"]):
        expect = (out["ss_between"] / (out["k"] - 1)) / (
            out["ss_within"] / (out["n"] - out["k"])
        )
        assert math.isclose(out["f_stat"], expect, rel_tol=1e-3, abs_tol=1e-3)


def test_association_rules_directionality(spark):
    out = QUERIES["q_association_rules"](spark, SF_DIR).toPandas()
    assert len(out) > 0
    assert (out["confidence_x10000"] <= 10000).all()
    assert (out["support_x10000"] >= 200 - 1).all()  # 2% floor
    # directedness: confidence(a->b) generally != confidence(b->a);
    # verify both directions exist for at least one pair and that
    # n_both is symmetric while confidence uses the antecedent marginal
    key = out.set_index(["antecedent", "consequent"])
    found = False
    for (a, b), row in key.iterrows():
        if (b, a) in key.index:
            assert key.loc[(b, a), "n_both"] == row["n_both"]
            found = True
            break
    assert found


def test_hill_tail_index_positive_and_k50(spark):
    out = QUERIES["q_hill_tail_index"](spark, SF_DIR).toPandas()
    assert len(out) == 5
    assert (out["k"] == 50).all()
    ok = out["hill_alpha"].dropna()
    assert (ok > 0).all()


def test_interarrival_and_burstiness_sanity(spark):
    ia = QUERIES["q_interarrival_stats"](spark, SF_DIR).toPandas()
    bf = QUERIES["q_burstiness"](spark, SF_DIR).toPandas()
    assert len(ia) == 5 and len(bf) == 5
    assert (ia["mean_gap_s"] > 0).all()
    assert (ia["cv"].dropna() >= 0).all()
    assert (bf["fano_factor"].dropna() >= 0).all()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    for _, row in bf.iterrows():
        g = ev[ev.event_type == row["event_type"]]
        mins = g.ts.dt.floor("min").value_counts()
        assert row["n_minutes"] == len(mins)
        assert math.isclose(row["mean_per_min"], mins.mean(), abs_tol=1e-3)
        fano = mins.var(ddof=0) / mins.mean()
        assert math.isclose(row["fano_factor"], fano, abs_tol=1e-3)


def test_graph_components_partition_nodes(spark):
    out = QUERIES["q_graph_components"](spark, SF_DIR).toPandas()
    bfs = QUERIES["q_bfs_distance"](spark, SF_DIR).toPandas()
    # components partition the strong-node set; the BFS-reachable set
    # from the min node is contained in one component
    n_nodes = (out["component_size"] * out["n_components"]).sum()
    assert n_nodes >= len(bfs)
    assert out["component_size"].max() >= len(bfs)


def test_ttr_by_length_matches_pandas(spark):
    out = QUERIES["q_ttr_by_length"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    w = docs.text.str.split(" ").apply(lambda ws: [x for x in ws if x])
    per = pd.DataFrame(
        {"nt": w.str.len(), "ty": w.apply(lambda ws: len(set(ws)))}
    )
    per = per[per.nt > 0]
    per["b"] = np.minimum(per.nt // 50, 5)
    for _, row in out.iterrows():
        g = per[per.b == row["len_bucket"]]
        assert row["n_docs"] == len(g)
        assert row["total_tokens"] == g.nt.sum()
        assert row["total_types"] == g.ty.sum()
        expect = round(10000 * g.ty.sum() / g.nt.sum())
        assert abs(row["pooled_ttr_x10000"] - expect) <= 1


def test_runs_test_counts_verified(spark):
    out = QUERIES["q_runs_test"](spark, SF_DIR).toPandas()
    assert len(out) == 5
    for _, row in out.iterrows():
        assert row["n"] == row["n_pos"] + row["n_neg"]
        # runs bounded by [1, n] and at least max(n_pos, n_neg) runs are
        # impossible to exceed n
        assert 1 <= row["n_runs"] <= row["n"]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    # independent recomputation for one symbol
    sym = out.symbol.iloc[0]
    g = ev[ev.event_type == sym].copy()
    key = (
        g["ts"].astype("int64").astype("string").str.zfill(20)
        + "-"
        + g["event_id"].astype("string").str.zfill(12)
    )
    closes = (
        g.assign(__k=key, bar=g.ts.dt.floor("h"))
        .sort_values("__k")
        .groupby("bar")
        .last()["value"]
    )
    r = closes.pct_change().dropna()
    signs = (r[r != 0] > 0).astype(int).values
    runs = 1 + int((signs[1:] != signs[:-1]).sum())
    row = out[out.symbol == sym].iloc[0]
    assert row["n_runs"] == runs
    assert row["n_pos"] == signs.sum()


def test_market_profile_top5_ordered(spark):
    out = QUERIES["q_market_profile"](spark, SF_DIR).toPandas()
    assert len(out) == 25
    for sym, g in out.groupby("symbol"):
        g = g.sort_values("rk")
        assert (g["n_ticks"].diff().dropna() <= 0).all()
        ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
        vals = ev[ev.event_type == sym]["value"]
        top = np.floor(vals).value_counts()
        assert g["n_ticks"].iloc[0] == top.max()
        assert g["share_x10000"].sum() <= 10000 + 5


def test_acf_correlogram_lag1_matches_autocorr(spark):
    acf = QUERIES["q_acf_correlogram"](spark, SF_DIR).toPandas()
    single = (
        QUERIES["q_autocorr"](spark, SF_DIR).toPandas().set_index("symbol")
    )
    assert len(acf) == 25
    lag1 = acf[acf.lag == 1].set_index("symbol")
    for sym in lag1.index:
        a, b = lag1.loc[sym, "acf"], single.loc[sym, "acf1"]
        if pd.notna(a) and pd.notna(b):
            assert math.isclose(a, b, abs_tol=1e-6)
    ok = acf["acf"].dropna()
    assert ((ok >= -1) & (ok <= 1)).all()


def test_pacf_lag1_equals_acf1(spark):
    pacf = QUERIES["q_pacf"](spark, SF_DIR).toPandas().set_index("symbol")
    acf = (
        QUERIES["q_acf_correlogram"](spark, SF_DIR)
        .toPandas()
        .query("lag == 1")
        .set_index("symbol")
    )
    for sym in pacf.index:
        a, b = pacf.loc[sym, "pacf1"], acf.loc[sym, "acf"]
        if pd.notna(a) and pd.notna(b):
            assert math.isclose(a, b, abs_tol=1e-5)
    ok = pacf[["pacf1", "pacf2"]].stack().dropna()
    assert ((ok >= -1.01) & (ok <= 1.01)).all()
