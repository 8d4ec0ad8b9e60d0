"""Market-indicator battery: VWAP, RSI, MACD, log returns, Garman–Klass
volatility, and candlestick-pattern flags.

These are the canonical post-load indicator queries a market-data
warehouse serves (the reference loads scraped histories into BigQuery for
exactly this kind of analysis — /root/reference/dump_bigq.py:135-149);
each is expressed as windows/aggregations over the deterministic hourly
or daily bar series derived from `events` (bars via the same padded
(ts,event_id) ordering key as q_ohlc_resample).

Determinism policy (same as timeseries.py): frame/group sums accumulate
in exact DECIMAL; any double math (ln, sqrt, divisions, EMA recurrences)
uses the IDENTICAL expression tree on both engines so float64 results
agree bit-for-bit before the output round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stockmarketdata_dwb_etl_spark.catalog import load_table
from stockmarketdata_dwb_etl_spark.functions.exact import portable_round
from stockmarketdata_dwb_etl_spark.queries.stats_q import (
    _dsum2,
    _ssum2,
    _wdsum2,
    _wssum2,
)
from stockmarketdata_dwb_etl_spark.queries.timeseries import _DUCK_ORD, _spark_ord
from stockmarketdata_dwb_etl_spark.registry import query

_DEC = "decimal(38,6)"


def _close_bars(spark: SparkSession, sf_dir: str, grain: str = "hour") -> DataFrame:
    """Per-symbol close series at the given grain, deterministic close =
    max_by on the padded (ts,event_id) key — the shared bar basis."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc(grain, F.col("ts")).alias("bar_ts"),
    ).agg(F.max_by("value", _spark_ord()).alias("close"))


_DUCK_CLOSE_BARS = f"""
    bars AS (
        SELECT event_type AS symbol,
               date_trunc('hour', ts) AS bar_ts,
               arg_max(value, {_DUCK_ORD}) AS close
        FROM events GROUP BY 1, 2
    )
"""


@query(
    "q_vwap",
    oracle="""
    SELECT CAST(date_trunc('day', l_shipdate) AS DATE) AS ship_day,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty,
           CAST(CAST(floor(
               CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(38,6)))
                    AS DOUBLE)
               / CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
               * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS DOUBLE) AS vwap
    FROM lineitem
    GROUP BY 1 ORDER BY 1
    """,
)
def q_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily volume-weighted average price: Σ(price·qty)/Σ(qty) per ship
    day — the execution-quality benchmark price. Both sums accumulate in
    exact DECIMAL (order-independent across partitions); only the final
    quotient runs in double with the identical expression tree. Scales:
    one partial+final hash-agg keyed by day, no window, no join."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.to_date(F.date_trunc("day", "l_shipdate")).alias("ship_day"))
        .agg(
            F.sum(F.col("l_quantity").cast(_DEC)).alias("__q"),
            F.sum(
                (F.col("l_extendedprice") * F.col("l_quantity")).cast(_DEC)
            ).alias("__pq"),
        )
        .select(
            "ship_day",
            F.col("__q").cast("double").alias("total_qty"),
            # 6dp: past the harness's 4dp compare precision, so a quotient
            # landing on an exact 4dp tie is broken by the comparator's
            # uniform rounding, not by per-engine double round-half rules
            portable_round(
                F.col("__pq").cast("double") / F.col("__q").cast("double"), 6
            )
            .cast("double")
            .alias("vwap"),
        )
        .orderBy("ship_day")
    )


@query(
    "q_rsi",
    oracle=f"""
    WITH {_DUCK_CLOSE_BARS},
    seq AS (
        SELECT symbol, bar_ts, close,
               close - lag(close) OVER w AS diff,
               row_number() OVER w AS rn
        FROM bars
        WINDOW w AS (PARTITION BY symbol ORDER BY bar_ts)
    ),
    gl AS (
        SELECT symbol, bar_ts, close, rn,
               CAST(SUM(CAST(greatest(diff, 0) AS DECIMAL(38,6))) OVER f
                    AS DOUBLE) AS sg,
               CAST(SUM(CAST(greatest(-diff, 0) AS DECIMAL(38,6))) OVER f
                    AS DOUBLE) AS sl
        FROM seq
        WINDOW f AS (PARTITION BY symbol ORDER BY rn
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT symbol, bar_ts, close,
           CAST(CAST(floor(CAST(CASE WHEN sl = 0 THEN 100.0
                           ELSE 100.0 - 100.0 / (1.0 + sg / sl) END
                AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0
                AS DOUBLE) AS rsi14
    FROM gl WHERE rn >= 15
    ORDER BY symbol, bar_ts
    """,
)
def q_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSI-14 (Cutler's simple-moving-average variant) per symbol over the
    hourly close series: gains/losses from one-bar diffs, 14-bar frame
    sums in exact DECIMAL, RSI = 100 − 100/(1+RS) in double with the
    identical tree (all-loss windows pin to 100 per the textbook
    convention). Cutler's SMA form is window-expressible — unlike
    Wilder's recurrence (that smoothing shape is q_macd's territory) —
    so the whole indicator stays JVM-side: two stacked windows, one
    shuffle on symbol."""
    bars = _close_bars(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("bar_ts")
    seq = bars.select(
        "symbol",
        "bar_ts",
        "close",
        (F.col("close") - F.lag("close").over(w)).alias("diff"),
        F.row_number().over(w).alias("rn"),
    )
    f = Window.partitionBy("symbol").orderBy("rn").rowsBetween(-13, 0)
    gl = seq.select(
        "symbol",
        "bar_ts",
        "close",
        "rn",
        F.sum(F.greatest(F.col("diff"), F.lit(0)).cast(_DEC))
        .over(f)
        .cast("double")
        .alias("sg"),
        F.sum(F.greatest(-F.col("diff"), F.lit(0)).cast(_DEC))
        .over(f)
        .cast("double")
        .alias("sl"),
    ).filter(F.col("rn") >= 15)
    rsi = F.when(F.col("sl") == 0, F.lit(100.0)).otherwise(
        F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + F.col("sg") / F.col("sl"))
    )
    return gl.select(
        "symbol",
        "bar_ts",
        "close",
        portable_round(rsi, 4).cast("double").alias("rsi14"),
    ).orderBy("symbol", "bar_ts")


@query(
    "q_macd",
    oracle=f"""
    WITH RECURSIVE {_DUCK_CLOSE_BARS},
    seq AS (
        SELECT symbol, bar_ts, close,
               row_number() OVER (PARTITION BY symbol ORDER BY bar_ts) AS rn
        FROM bars
    ),
    packed AS (
        SELECT symbol, list(close ORDER BY rn) AS xs,
               len(list(close)) AS n
        FROM seq GROUP BY symbol
    ),
    rec AS (
        SELECT symbol, xs, n, 1 AS rn,
               xs[1] AS e12, xs[1] AS e26, CAST(0.0 AS DOUBLE) AS sig
        FROM packed
        UNION ALL
        SELECT symbol, xs, n, rn + 1,
               (1 - 2.0 / 13.0) * e12 + (2.0 / 13.0) * xs[rn + 1],
               (1 - 2.0 / 27.0) * e26 + (2.0 / 27.0) * xs[rn + 1],
               0.8 * sig + 0.2 * (((1 - 2.0 / 13.0) * e12
                                   + (2.0 / 13.0) * xs[rn + 1])
                                  - ((1 - 2.0 / 27.0) * e26
                                     + (2.0 / 27.0) * xs[rn + 1]))
        FROM rec WHERE rn < n
    )
    SELECT s.symbol, s.bar_ts, s.close,
           CAST((CAST(floor(CAST((r.e12 - r.e26) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS macd,
           CAST((CAST(floor(CAST((r.sig) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS signal,
           CAST((CAST(floor(CAST(((r.e12 - r.e26) - r.sig) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS histogram
    FROM seq s JOIN rec r ON s.symbol = r.symbol AND s.rn = r.rn
    ORDER BY s.symbol, s.bar_ts
    """,
)
def q_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD(12, 26, 9) per symbol over hourly closes: fast/slow EMAs,
    their difference (the MACD line), and the 9-period signal EMA of
    that line, all seeded at the first bar (signal seeds at 0 = the
    first MACD value). Triple sequential recurrence — the documented
    (b)-path custom operator, like q_ewma: one Arrow-batched
    ``applyInPandas`` pass per symbol computes all three EMAs in a
    single loop with the exact multiply-add order the oracle's
    recursive CTE replays ((1−α)·e + α·x; signal folds the NEW macd),
    so float64 trajectories match bit-for-bit before the 4dp round.
    Scale: per-symbol bar series are calendar-bounded; the tick→bar
    hash-agg is the only full-data shuffle (same posture as q_ewma)."""
    import pandas as pd

    bars = _close_bars(spark, sf_dir)
    a12, a26, a9 = 2.0 / 13.0, 2.0 / 27.0, 0.2

    def macd_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bar_ts").reset_index(drop=True)
        e12 = e26 = None
        sig = 0.0
        m12, m26, msig = [], [], []
        for x in pdf["close"]:
            if e12 is None:
                e12, e26, sig = x, x, 0.0
            else:
                e12 = (1 - a12) * e12 + a12 * x
                e26 = (1 - a26) * e26 + a26 * x
                sig = (1 - a9) * sig + a9 * (e12 - e26)
            m12.append(e12)
            m26.append(e26)
            msig.append(sig)
        pdf["e12"], pdf["e26"], pdf["sig"] = m12, m26, msig
        return pdf

    long = bars.groupBy("symbol").applyInPandas(
        macd_group,
        "symbol string, bar_ts timestamp, close double,"
        " e12 double, e26 double, sig double",
    )
    return long.select(
        "symbol",
        "bar_ts",
        "close",
        portable_round(F.col("e12") - F.col("e26"), 4).cast("double").alias("macd"),
        portable_round(F.col("sig"), 4).cast("double").alias("signal"),
        portable_round((F.col("e12") - F.col("e26")) - F.col("sig"), 4)
        .cast("double")
        .alias("histogram"),
    ).orderBy("symbol", "bar_ts")


@query(
    "q_log_returns",
    oracle=f"""
    WITH {_DUCK_CLOSE_BARS},
    seq AS (
        SELECT symbol, bar_ts, close,
               ln(close / lag(close) OVER w) AS r
        FROM bars
        WINDOW w AS (PARTITION BY symbol ORDER BY bar_ts)
    )
    SELECT symbol, bar_ts, close,
           CAST((CAST(floor(CAST((r) AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS DOUBLE) AS log_return,
           CAST((CAST(floor(CAST((exp({_wdsum2(
               "r",
               '''OVER (PARTITION BY symbol ORDER BY bar_ts
                         ROWS UNBOUNDED PRECEDING)''', 12, 8)}
               )) AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS DOUBLE) AS cum_growth
    FROM seq WHERE r IS NOT NULL
    ORDER BY symbol, bar_ts
    """,
)
def q_log_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol hourly log returns ln(c_t/c_{t−1}) plus the cumulative
    growth factor exp(Σr) — the additive-returns basis every risk model
    starts from. Each ln runs in double with the identical tree; the
    running sum casts each return to DECIMAL(38,18) first so the
    accumulation is exact and order-independent (a double running sum's
    association order is engine-internal — decimal removes that freedom);
    exp + round at the end. One window shuffle on symbol, O(1) state."""
    bars = _close_bars(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("bar_ts")
    seq = bars.select(
        "symbol",
        "bar_ts",
        "close",
        F.log(F.col("close") / F.lag("close").over(w)).alias("r"),
    ).filter(F.col("r").isNotNull())
    wrun = (
        Window.partitionBy("symbol")
        .orderBy("bar_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return seq.select(
        "symbol",
        "bar_ts",
        "close",
        portable_round("r", 6).cast("double").alias("log_return"),
        portable_round(
            F.exp(_wssum2(F.col("r"), wrun, 12, 8)), 6
        )
        .cast("double")
        .alias("cum_growth"),
    ).orderBy("symbol", "bar_ts")


@query(
    "q_volatility_gk",
    oracle=f"""
    WITH bars AS (
        SELECT event_type AS symbol,
               date_trunc('day', ts) AS bar_ts,
               arg_min(value, {_DUCK_ORD}) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               arg_max(value, {_DUCK_ORD}) AS close
        FROM events GROUP BY 1, 2
    ),
    gk AS (
        SELECT symbol,
               0.5 * ln(high / low) * ln(high / low)
               - (2.0 * ln(2.0) - 1.0) * ln(close / open) * ln(close / open)
                 AS g
        FROM bars
        WHERE low > 0
    )
    SELECT symbol, CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST((CAST(floor(CAST(({_dsum2("g", 12, 8)})
                      / COUNT(*) AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS DOUBLE) AS gk_var,
           CAST((CAST(floor(CAST((sqrt(greatest(
               ({_dsum2("g", 12, 8)}) / COUNT(*),
               0.0))) AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS DOUBLE) AS gk_vol
    FROM gk GROUP BY symbol ORDER BY symbol
    """,
)
def q_volatility_gk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Garman–Klass volatility per symbol from daily OHLC bars: the
    range-based variance estimator 0.5·ln(H/L)² − (2ln2−1)·ln(C/O)²
    averaged over days, plus its square root (clamped at 0 — the
    estimator can go negative on gap days). Bars whose low is ≤ 0 are
    excluded: log-range estimators are defined on positive prices, and
    an untraded/zero print would otherwise divide by zero (ANSI crash,
    hit at sf0.1). Per-bar terms run in double with the identical tree
    (products, not pow — same bits both engines), then cast to
    DECIMAL(38,18) so the mean is exact and order-independent. Scales:
    tick→daily-bar hash-agg then a tiny per-symbol agg — one shuffle."""
    ev = load_table(spark, sf_dir, "events")
    bars = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", F.col("ts")).alias("bar_ts"),
    ).agg(
        F.min_by("value", _spark_ord()).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", _spark_ord()).alias("close"),
    ).filter(F.col("low") > 0)
    lhl = F.log(F.col("high") / F.col("low"))
    lco = F.log(F.col("close") / F.col("open"))
    g = (
        F.lit(0.5) * lhl * lhl
        - (F.lit(2.0) * F.log(F.lit(2.0)) - F.lit(1.0)) * lco * lco
    )
    agg = bars.select("symbol", g.alias("g")).groupBy("symbol").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        _ssum2(F.col("g"), 12, 8).alias("__sg"),
    )
    mean_g = F.col("__sg") / F.col("n_days")
    return agg.select(
        "symbol",
        "n_days",
        portable_round(mean_g, 6).cast("double").alias("gk_var"),
        portable_round(F.sqrt(F.greatest(mean_g, F.lit(0.0))), 6)
        .cast("double")
        .alias("gk_vol"),
    ).orderBy("symbol")


@query(
    "q_candlestick",
    oracle=f"""
    WITH bars AS (
        SELECT event_type AS symbol,
               date_trunc('hour', ts) AS bar_ts,
               arg_min(value, {_DUCK_ORD}) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               arg_max(value, {_DUCK_ORD}) AS close
        FROM bars_src
        GROUP BY 1, 2
    ),
    flagged AS (
        SELECT symbol, bar_ts, open, close,
               abs(close - open) <= 0.1 * (high - low) AS doji,
               lag(open) OVER w IS NOT NULL
                 AND lag(close) OVER w < lag(open) OVER w
                 AND close > open
                 AND open <= lag(close) OVER w
                 AND close >= lag(open) OVER w AS bullish_engulf,
               lag(open) OVER w IS NOT NULL
                 AND lag(close) OVER w > lag(open) OVER w
                 AND close < open
                 AND open >= lag(close) OVER w
                 AND close <= lag(open) OVER w AS bearish_engulf
        FROM bars
        WINDOW w AS (PARTITION BY symbol ORDER BY bar_ts)
    )
    SELECT symbol, bar_ts,
           CAST((CAST(floor(CAST((open) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS open,
           CAST((CAST(floor(CAST((close) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS close,
           doji, bullish_engulf, bearish_engulf
    FROM flagged
    WHERE doji OR bullish_engulf OR bearish_engulf
    ORDER BY symbol, bar_ts
    """.replace("bars_src", "events"),
)
def q_candlestick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candlestick-pattern detection over hourly OHLC bars: doji (body
    within 10% of the bar range) and bullish/bearish engulfing (current
    body swallows the previous opposite-color body, via lag). Pure
    boolean logic over parquet doubles — comparisons are engine-exact,
    no float accumulation anywhere; only the echoed open/close round.
    Scales: bar hash-agg then one lag window, both keyed by symbol —
    one shuffle, map-side filter emits only pattern bars."""
    ev = load_table(spark, sf_dir, "events")
    bars = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("hour", F.col("ts")).alias("bar_ts"),
    ).agg(
        F.min_by("value", _spark_ord()).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", _spark_ord()).alias("close"),
    )
    w = Window.partitionBy("symbol").orderBy("bar_ts")
    po, pc = F.lag("open").over(w), F.lag("close").over(w)
    flagged = bars.select(
        "symbol",
        "bar_ts",
        "open",
        "close",
        (
            F.abs(F.col("close") - F.col("open"))
            <= F.lit(0.1) * (F.col("high") - F.col("low"))
        ).alias("doji"),
        (
            po.isNotNull()
            & (pc < po)
            & (F.col("close") > F.col("open"))
            & (F.col("open") <= pc)
            & (F.col("close") >= po)
        ).alias("bullish_engulf"),
        (
            po.isNotNull()
            & (pc > po)
            & (F.col("close") < F.col("open"))
            & (F.col("open") >= pc)
            & (F.col("close") <= po)
        ).alias("bearish_engulf"),
    )
    return (
        flagged.filter(
            F.col("doji") | F.col("bullish_engulf") | F.col("bearish_engulf")
        )
        .select(
            "symbol",
            "bar_ts",
            portable_round("open", 4).cast("double").alias("open"),
            portable_round("close", 4).cast("double").alias("close"),
            "doji",
            "bullish_engulf",
            "bearish_engulf",
        )
        .orderBy("symbol", "bar_ts")
    )
