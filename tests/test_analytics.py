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
    """The sketch answer must sit within 1% relative error of the exact
    interpolated percentile per group (GK accuracy 10000 ≫ needed)."""
    from stockmarketdata_dwb_etl_spark.catalog import load_table
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all

    load_all()
    approx = {
        r.l_returnflag: (r.approx_median, r.approx_p90)
        for r in QUERIES["q_approx_percentile"](spark, SF_DIR).collect()
    }
    exact = {
        r.l_returnflag: (r.m, r.p)
        for r in load_table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.5).alias("m"),
            F.percentile("l_quantity", 0.9).alias("p"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for k, (m, p) in exact.items():
        assert abs(approx[k][0] - m) <= max(0.01 * abs(m), 1.0)
        assert abs(approx[k][1] - p) <= max(0.01 * abs(p), 1.0)
