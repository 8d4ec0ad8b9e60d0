"""Accuracy checks for the sketch-based operators that have no SQL oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_approx_distinct_accuracy(spark):
    """The query now emits the HLL error bound itself (approx_ok =
    |approx - exact| <= 5% of exact) next to the hash-checked exact
    count: every group must report the bound satisfied."""
    from stockmarketdata_dwb_etl_spark.catalog import load_table
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["q_approx_distinct"](spark, SF_DIR).collect()
    exact = {
        r.event_type: r.n
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {r.event_type for r in rows} == set(exact)
    for r in rows:
        assert r.approx_ok, (r.event_type, r.exact_users)
        assert r.exact_users == exact[r.event_type]


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
