"""Accuracy checks for the sketch-based operators that have no SQL oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_approx_distinct_accuracy(spark):
    """HLL++ at rsd=1% must land within 5% of the exact distinct count for
    every group."""
    from stockmarketdata_dwb_etl_spark.catalog import load_table
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all

    load_all()
    approx = {
        r.event_type: r.approx_users
        for r in QUERIES["q_approx_distinct"](spark, SF_DIR).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(1, 0.05 * n), (et, approx[et], n)


def test_approx_percentile_close_to_exact(spark):
    """The query now emits the error bound itself (|approx - exact| <= 1.0
    per group, GK accuracy 10000 ≫ needed): every group must report both
    bounds ok, and group counts must match the table."""
    from stockmarketdata_dwb_etl_spark.catalog import load_table
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["q_approx_percentile"](spark, SF_DIR).collect()
    counts = {
        r.l_returnflag: r.n
        for r in load_table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {r.l_returnflag for r in rows} == set(counts)
    for r in rows:
        assert r.median_ok and r.p90_ok, r
        assert r.n_rows == counts[r.l_returnflag], r
