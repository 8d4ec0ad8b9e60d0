"""Property tests for the two-bucket split sum (stats_q._ssum2/_dsum2):
Spark and DuckDB must produce the identical double over a column whose
magnitudes span many orders — the exact shape that breaks a single-dp
round-then-DECIMAL sum once |term|·10^n crosses 2^53 (the real
cross-engine round-trip bound recorded in functions/exact.py)."""

from __future__ import annotations

import duckdb
import pytest


@pytest.fixture(scope="module")
def wide_range_values():
    # deterministic values spanning 1e-9 .. 1e7, mixed signs — includes
    # terms where |x|*1e12 > 2^53 (the single-dp failure zone)
    vals = []
    for i in range(1, 400):
        vals.append((i * 0.37e-3) * (10 ** (i % 11 - 5)))
        vals.append(-(i * 0.11e-2) * (10 ** ((i * 7) % 9 - 4)))
    vals.append(9_359_500.0 / 1_000.0)  # the q_anova_hod outlier shape
    vals.append(1.0550412345e6)
    return vals


def test_split_sum_cross_engine_identical(spark, wide_range_values):
    from stockmarketdata_dwb_etl_spark.queries.stats_q import _dsum2, _ssum2

    df = spark.createDataFrame([(v,) for v in wide_range_values], ["x"])
    got_spark = df.agg(_ssum2("x", 12, 8).alias("s")).collect()[0]["s"]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({v!r})" for v in wide_range_values)
        + ") AS v(x)"
    )
    got_duck = con.execute(f"SELECT {_dsum2('x', 12, 8)} FROM t").fetchone()[0]
    con.close()

    # bit-identical, not approx: the entire point of the helper
    assert got_spark == got_duck, (got_spark, got_duck)


def test_split_sum_order_independent(spark, wide_range_values):
    from stockmarketdata_dwb_etl_spark.queries.stats_q import _ssum2

    fwd = spark.createDataFrame([(v,) for v in wide_range_values], ["x"])
    rev = spark.createDataFrame(
        [(v,) for v in reversed(wide_range_values)], ["x"]
    ).repartition(7)
    a = fwd.agg(_ssum2("x", 12, 8).alias("s")).collect()[0]["s"]
    b = rev.agg(_ssum2("x", 12, 8).alias("s")).collect()[0]["s"]
    assert a == b


def test_split_sum_precision_keeps_small_terms(spark):
    """A coarse uniform round would zero sub-1e-8 terms entirely; the
    split sum must keep them at 12dp."""
    from stockmarketdata_dwb_etl_spark.queries.stats_q import _ssum2

    tiny = [1e-9] * 1000  # sums to 1e-6 — visible only at fine dp
    df = spark.createDataFrame([(v,) for v in tiny], ["x"])
    got = df.agg(_ssum2("x", 12, 8).alias("s")).collect()[0]["s"]
    assert got == pytest.approx(1e-6, rel=1e-6)


def test_fold_term_sum_exact_at_precision_28(spark):
    """Regression for the decimal fold overflow-rounding trap: Spark
    promotes decimal(38,n)+decimal(38,n) to precision 39, over the cap,
    and silently REDUCES the result scale to n-1 — half-up-rounding
    every fold step (observed +29e-10 over a 20-element frame on q_cci
    before functions/exact.py::fold_term_sum moved to precision 28,
    whose (29,n) additions stay exact)."""
    import math
    from decimal import Decimal

    from pyspark.sql import functions as F

    from stockmarketdata_dwb_etl_spark.functions.exact import fold_term_sum

    # magnitudes chosen so a scale-(n-1) per-step round visibly drifts
    vals = [36.21466666683333, 27.48800000016665, 22.874666666833328,
            14.234666666833327, 14.128000000166672, 13.678000000166662,
            9.771333333499996, 5.194666666833342, 4.0846666668333285,
            2.86800000016666, 2.7780000001666565, 1.4113333334999822,
            0.5080000001666463, 0.1913333334999976, 1.8586666664999996,
            3.208666666499994, 6.045333333166667, 9.825333333166668,
            55.378666666500024, 79.10866666650001]
    expected = float(
        sum(Decimal(math.floor(v * 1e10 + 0.5)) for v in vals)
        / Decimal(10**10)
    )
    df = spark.createDataFrame([(vals,)], ["arr"])
    got = df.select(
        fold_term_sum(F.col("arr"), 10).alias("s")
    ).collect()[0]["s"]
    assert got == expected, (got, expected)


def test_windowed_split_sum_cross_engine_identical(spark, wide_range_values):
    """_wssum2/_wdsum2 (the frame-aggregate twins) must agree
    bit-for-bit over a running frame, same contract as the group
    form."""
    import duckdb as _duck

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from stockmarketdata_dwb_etl_spark.queries.stats_q import (
        _wdsum2,
        _wssum2,
    )

    rows = [(i, v) for i, v in enumerate(wide_range_values)]
    df = spark.createDataFrame(rows, ["i", "x"])
    w = Window.orderBy("i").rowsBetween(-13, 0)
    got = {
        r["i"]: r["s"]
        for r in df.select("i", _wssum2("x", w, 12, 8).alias("s")).collect()
    }

    con = _duck.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, {v!r})" for i, v in rows)
        + ") AS v(i, x)"
    )
    over = ("OVER (ORDER BY i ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)")
    duck = dict(
        con.execute(
            f"SELECT i, {_wdsum2('x', over, 12, 8)} FROM t ORDER BY i"
        ).fetchall()
    )
    con.close()
    assert got == duck
