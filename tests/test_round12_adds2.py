"""Semantic tests for the round-12 batch-7 operators (dataops25) — the
invariants the driver's oracle hash can't see: Corwin–Schultz spread
bounds, VPIN ∈ [0,1] with exact bucket accounting, PSR probability
bounds and monotone response, Burke denominator consistency."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def _run(spark, name):
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all

    load_all()
    return QUERIES[name](spark, SF_DIR).collect()


def test_corwin_schultz_bounds(spark):
    rows = _run(spark, "q_corwin_schultz")
    assert len(rows) == 5
    for r in rows:
        # spread is a floored average of per-day values in [0, 2)
        assert 0.0 <= r["cs_spread"] < 2.0
        assert 0 <= r["n_positive"] <= r["n_pairs"]
        assert r["n_pairs"] > 0


def test_vpin_bounds_and_bucket_accounting(spark):
    rows = _run(spark, "q_vpin")
    # symbols with fewer than one full 200-tick bucket emit no row at
    # the small fixture; the ones that do must be in-bounds
    assert 1 <= len(rows) <= 5
    for r in rows:
        assert 0.0 <= r["vpin"] <= 1.0
        # max per-bucket imbalance can't exceed the bucket volume
        assert 0 <= r["max_imbalance"] <= 200
        assert r["n_buckets"] >= 1


def test_vpin_drops_partial_bucket(spark):
    # every counted bucket is full by construction: n_buckets equals
    # floor(symbol tick count / 200)
    from stockmarketdata_dwb_etl_spark.catalog import load_table
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all

    load_all()
    from pyspark.sql import functions as F

    counts = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    rows = QUERIES["q_vpin"](spark, SF_DIR).collect()
    for r in rows:
        assert r["n_buckets"] == counts[r["symbol"]] // 200
    # symbols absent from the result are exactly those without one
    # full bucket
    present = {r["symbol"] for r in rows}
    for sym, n in counts.items():
        if sym not in present:
            assert n < 200


def test_prob_sharpe_probability_bounds(spark):
    rows = _run(spark, "q_prob_sharpe")
    assert len(rows) == 5
    for r in rows:
        if r["psr"] is not None:
            assert 0.0 <= r["psr"] <= 1.0
            # PSR and SR must agree in direction around 1/2
            if r["sharpe"] > 0.01:
                assert r["psr"] > 0.5
            if r["sharpe"] < -0.01:
                assert r["psr"] < 0.5


def test_phi_matches_scipy_free_reference(spark):
    # A&S 26.2.17 vs math.erf-based Phi: |eps| < 7.5e-8 by construction
    import math

    from pyspark.sql import functions as F

    from stockmarketdata_dwb_etl_spark.queries.dataops25 import _spark_phi

    zs = [-3.5, -1.0, -0.1, 0.0, 0.3, 1.64, 2.33, 4.0]
    df = spark.createDataFrame([(z,) for z in zs], ["z"])
    got = [
        r["p"]
        for r in df.select(_spark_phi(F.col("z")).alias("p"))
        .orderBy("z")
        .collect()
    ]
    for z, p in zip(sorted(zs), got):
        ref = 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))
        assert p == pytest.approx(ref, abs=1e-7)


def test_burke_ratio_consistency(spark):
    rows = _run(spark, "q_burke_ratio")
    assert len(rows) == 5
    for r in rows:
        assert r["n_spells"] >= 0
        assert r["dd_rss"] >= 0.0
        if r["burke_ann"] is not None:
            assert r["dd_rss"] > 0.0
