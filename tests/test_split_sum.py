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
