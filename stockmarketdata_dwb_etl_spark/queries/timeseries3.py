"""Timeseries battery round 3b: seasonal decomposition, linear forecast
extrapolation, and IQR outlier fences.

Rounds out the anomaly/forecast corner of the market-analytics surface
(joining q_zscore_outliers, q_mad_outliers, q_cusum_changepoint,
q_regression): classical moving-average decomposition, the simplest
trend-extrapolation forecast, and Tukey fences.

Determinism: bar bases use the padded (ts,event_id) ordering key from
timeseries.py; frame sums accumulate in exact DECIMAL; regression uses
the built-in algebraic regr_* aggregates both engines share; quartiles
use the linearly-interpolated percentile both engines define at rank
(n−1)·p.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stockmarketdata_dwb_etl_spark.catalog import load_table
from stockmarketdata_dwb_etl_spark.queries.timeseries import _DUCK_ORD, _spark_ord
from stockmarketdata_dwb_etl_spark.registry import query

_DEC = "decimal(38,6)"

_DUCK_BARS = f"""
    bars AS (
        SELECT event_type AS symbol,
               date_trunc('hour', ts) AS bar_ts,
               arg_max(value, {_DUCK_ORD}) AS close
        FROM events GROUP BY 1, 2
    )
"""


def _bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("hour", F.col("ts")).alias("bar_ts"),
    ).agg(F.max_by("value", _spark_ord()).alias("close"))


@query(
    "q_seasonal_decompose",
    oracle=f"""
    WITH {_DUCK_BARS},
    seq AS (
        SELECT symbol, bar_ts, close, hour(bar_ts) AS hod,
               row_number() OVER (PARTITION BY symbol ORDER BY bar_ts) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY symbol) AS BIGINT) AS n
        FROM bars
    ),
    trend AS (
        SELECT symbol, bar_ts, close, hod, rn, n,
               CAST(SUM(CAST(close AS DECIMAL(38,6))) OVER w AS DOUBLE) / 25
                 AS trend
        FROM seq
        WINDOW w AS (PARTITION BY symbol ORDER BY rn
                     ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    ),
    resid AS (
        SELECT symbol, hod, close - trend AS r
        FROM trend WHERE rn > 12 AND rn <= n - 12
    )
    SELECT symbol, hod,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           CAST(ROUND(CAST(SUM(CAST(r AS DECIMAL(38,6))) AS DOUBLE)
                      / COUNT(*), 6) AS DOUBLE) AS seasonal
    FROM resid
    GROUP BY symbol, hod
    ORDER BY symbol, hod
    """,
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition, seasonal component: trend = a
    centered 25-bar moving average over the hourly close series (full
    windows only — the textbook edge trim), residual = close − trend,
    seasonal profile = mean residual per hour-of-day per symbol. Both
    the trend frame sum and the residual mean accumulate in exact
    DECIMAL; the /25 and final mean divide in identical-tree double.
    Scales: one symbol-keyed window + one (symbol,hod)-keyed hash-agg —
    two shuffles, both on bar-grained (calendar-bounded) data."""
    bars = _bars(spark, sf_dir)
    wseq = Window.partitionBy("symbol").orderBy("bar_ts")
    seq = bars.select(
        "symbol",
        "bar_ts",
        "close",
        F.hour("bar_ts").alias("hod"),
        F.row_number().over(wseq).alias("rn"),
        F.count(F.lit(1))
        .over(
            Window.partitionBy("symbol").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .cast("bigint")
        .alias("n"),
    )
    wtrend = Window.partitionBy("symbol").orderBy("rn").rowsBetween(-12, 12)
    trend = seq.select(
        "symbol",
        "hod",
        "close",
        "rn",
        "n",
        (
            F.sum(F.col("close").cast(_DEC)).over(wtrend).cast("double")
            / F.lit(25)
        ).alias("trend"),
    )
    resid = trend.filter(
        (F.col("rn") > 12) & (F.col("rn") <= F.col("n") - 12)
    ).select("symbol", "hod", (F.col("close") - F.col("trend")).alias("r"))
    return (
        resid.groupBy("symbol", "hod")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_obs"),
            F.round(
                F.sum(F.col("r").cast(_DEC)).cast("double") / F.count(F.lit(1)),
                6,
            )
            .cast("double")
            .alias("seasonal"),
        )
        .orderBy("symbol", "hod")
    )


@query(
    "q_forecast_linear",
    oracle=f"""
    WITH {_DUCK_BARS},
    seq AS (
        SELECT symbol, close,
               CAST(row_number() OVER (PARTITION BY symbol ORDER BY bar_ts)
                    AS DOUBLE) AS rn
        FROM bars
    ),
    fit AS (
        SELECT symbol,
               CAST(COUNT(*) AS BIGINT) AS n_bars,
               regr_slope(close, rn) AS slope,
               regr_intercept(close, rn) AS icept
        FROM seq GROUP BY symbol
    )
    SELECT f.symbol, h.horizon, f.n_bars,
           CAST(ROUND(f.icept + f.slope * (f.n_bars + h.horizon), 4)
                AS DOUBLE) AS forecast
    FROM fit f CROSS JOIN (
        SELECT unnest(generate_series(1, 5)) AS horizon) h
    ORDER BY f.symbol, h.horizon
    """,
)
def q_forecast_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-trend forecast: per-symbol OLS of close on bar index
    (algebraic regr_slope/regr_intercept aggregates — map-side moment
    accumulation, no iteration), extrapolated 1–5 bars past the series
    end via a generated horizon spine. The naive-but-canonical baseline
    every forecasting pipeline is judged against. Scales: one hash-agg
    per symbol + a 5-row explode — nothing global."""
    bars = _bars(spark, sf_dir)
    seq = bars.select(
        "symbol",
        "close",
        F.row_number()
        .over(Window.partitionBy("symbol").orderBy("bar_ts"))
        .cast("double")
        .alias("rn"),
    )
    fit = seq.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bars"),
        F.regr_slope("close", "rn").alias("slope"),
        F.regr_intercept("close", "rn").alias("icept"),
    )
    horizons = fit.select(
        "symbol",
        "n_bars",
        "slope",
        "icept",
        F.explode(F.sequence(F.lit(1), F.lit(5))).alias("horizon"),
    )
    return horizons.select(
        "symbol",
        "horizon",
        "n_bars",
        F.round(
            F.col("icept") + F.col("slope") * (F.col("n_bars") + F.col("horizon")),
            4,
        )
        .cast("double")
        .alias("forecast"),
    ).orderBy("symbol", "horizon")


@query(
    "q_outlier_iqr",
    oracle="""
    WITH q AS (
        SELECT event_type,
               quantile_cont(value, 0.25) AS q1,
               quantile_cont(value, 0.75) AS q3
        FROM events GROUP BY event_type
    ),
    fences AS (
        SELECT event_type, q1, q3,
               q1 - 1.5 * (q3 - q1) AS lo,
               q3 + 1.5 * (q3 - q1) AS hi
        FROM q
    )
    SELECT e.event_type,
           CAST(ROUND(f.lo, 4) AS DOUBLE) AS fence_lo,
           CAST(ROUND(f.hi, 4) AS DOUBLE) AS fence_hi,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE e.value < f.lo OR e.value > f.hi)
                AS BIGINT) AS n_outliers
    FROM events e JOIN fences f ON f.event_type = e.event_type
    GROUP BY e.event_type, f.lo, f.hi
    ORDER BY e.event_type
    """,
)
def q_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR outlier fences per event_type: quartiles by the shared
    linearly-interpolated percentile definition, fences at 1.5×IQR,
    outlier counts from a broadcast join of the per-type fences back to
    the stream — the third member of the outlier family (vs z-score's
    moment sensitivity and MAD's rank robustness). Fence comparisons are
    identical-tree doubles against raw parquet values. Scales: percentile
    agg + broadcast fence join + counting agg — the fact table streams
    twice, shuffles once (by type) for the percentile."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.percentile("value", 0.25).alias("q1"),
        F.percentile("value", 0.75).alias("q3"),
    )
    fences = q.select(
        F.col("event_type").alias("f_type"),
        (F.col("q1") - F.lit(1.5) * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + F.lit(1.5) * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    return (
        ev.join(F.broadcast(fences), F.col("event_type") == F.col("f_type"))
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(
                F.when(
                    (F.col("value") < F.col("lo"))
                    | (F.col("value") > F.col("hi")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select(
            "event_type",
            F.round("lo", 4).cast("double").alias("fence_lo"),
            F.round("hi", 4).cast("double").alias("fence_hi"),
            "n_rows",
            "n_outliers",
        )
        .orderBy("event_type")
    )
