"""As-of join operator unit tests (operators/asof.py) — backward match,
tolerance null-out on both time axes (timestamp and numeric), and
no-match rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from stockmarketdata_dwb_etl_spark.operators.asof import asof_join_backward


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_numeric_axis_tolerance(spark):
    left = _mk(
        spark,
        [(1, 100, "l1"), (1, 250, "l2"), (2, 50, "l3")],
        "k int, ts long, lpay string",
    )
    right = _mk(
        spark,
        [(1, 90, "r1"), (1, 140, "r2"), (2, 500, "r3")],
        "k int, ts long, rpay string",
    )
    got = {
        (r.k, r.ts): r.rpay
        for r in asof_join_backward(
            left, right, ["k"], "ts", ["rpay"], tolerance_seconds=60
        ).collect()
    }
    # (1,100): latest right <=100 is r1@90, age 10 <= 60 -> kept
    assert got[(1, 100)] == "r1"
    # (1,250): latest right <=250 is r2@140, age 110 > 60 -> nulled
    assert got[(1, 250)] is None
    # (2,50): no right row at or before -> null
    assert got[(2, 50)] is None


def test_timestamp_axis_tolerance_and_unbounded(spark):
    left = spark.sql(
        "SELECT 1 AS k, TIMESTAMP_NTZ '2024-01-01 10:00:00' AS ts, 'l1' AS lpay"
    )
    right = spark.sql(
        "SELECT 1 AS k, TIMESTAMP_NTZ '2024-01-01 08:00:00' AS ts, 'r1' AS rpay"
    )
    unbounded = asof_join_backward(left, right, ["k"], "ts", ["rpay"]).collect()
    assert unbounded[0].rpay == "r1"  # 2h-old match kept without tolerance
    bounded = asof_join_backward(
        left, right, ["k"], "ts", ["rpay"], tolerance_seconds=3600
    ).collect()
    assert bounded[0].rpay is None  # 2h old > 1h bound -> nulled
