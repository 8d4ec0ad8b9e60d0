"""Timeseries battery round 3: batch gap-sessionization, Bollinger bands
(rolling mean ± k·std with breach flags), and the forward-direction as-of
join.

These extend the market-data analytics surface of the reference's
post-load stage (/root/reference/dump_bigq.py:135-149 exists precisely so
analysts can run time-window shapes like these over the loaded history).
Determinism: timestamp arithmetic stays in exact integer microseconds;
frame sums go through the exact-decimal cast; the Pearson-style variance
combination uses the identical double op order on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stockmarketdata_dwb_etl_spark.catalog import load_table
from stockmarketdata_dwb_etl_spark.operators.asof import asof_join_forward
from stockmarketdata_dwb_etl_spark.registry import query

_DEC = "decimal(38,6)"
_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap, exact microseconds


@query(
    "q_sessionize_batch",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('microsecond', lag(ts) OVER w, ts)
                            > {_GAP_US}
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts, event_id,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(date_diff('microsecond', MIN(ts), MAX(ts)) AS BIGINT)
             AS duration_us
    FROM sessions
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
)
def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-based sessionization: a new session starts after a >30 min
    silence; sessions get per-user sequence numbers and (start, end, count,
    duration) stats — the batch counterpart of q_session_window's streaming
    session_window, and the classic cumulative-sum-of-flags formulation.
    Gap and duration arithmetic is exact integer microseconds (no
    truncating second-diff). Scales: two windows + one agg, all partitioned
    by user_id — a single shuffle, no self-join."""
    ev = load_table(spark, sf_dir, "events")
    wlag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.lag("ts").over(wlag).alias("__prev_ts"),
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("__prev_ts").isNull()
            | (
                F.expr("timestampdiff(MICROSECOND, __prev_ts, ts)")
                > F.lit(_GAP_US)
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.select(
        "user_id",
        "ts",
        "event_id",
        F.sum("new_session").over(wsum).alias("session_seq"),
    )
    return (
        sessions.groupBy("user_id", F.col("session_seq").cast("bigint").alias("session_seq"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
        .select(
            "user_id",
            "session_seq",
            "session_start",
            "session_end",
            "n_events",
            F.expr(
                "timestampdiff(MICROSECOND, session_start, session_end)"
            )
            .cast("bigint")
            .alias("duration_us"),
        )
        .orderBy("user_id", "session_seq")
    )


@query(
    "q_bollinger_bands",
    oracle="""
    WITH seq AS (
        SELECT event_type, event_id, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    sums AS (
        SELECT event_type, event_id, value, rn,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sx,
               CAST(SUM(CAST(value * value AS DECIMAL(38,6))) OVER w AS DOUBLE)
                 AS sxx
        FROM seq
        WINDOW w AS (PARTITION BY event_type ORDER BY rn
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, event_id, value,
           CAST(ROUND(sx / 20, 6) AS DOUBLE) AS ma20,
           CAST(ROUND(sx / 20 + 2 * (sqrt(20 * sxx - sx * sx) / 20), 6)
                AS DOUBLE) AS upper_band,
           CAST(ROUND(sx / 20 - 2 * (sqrt(20 * sxx - sx * sx) / 20), 6)
                AS DOUBLE) AS lower_band,
           CAST(value > sx / 20 + 2 * (sqrt(20 * sxx - sx * sx) / 20)
                AS BOOLEAN) AS breach_upper
    FROM sums WHERE rn >= 20
    ORDER BY event_type, event_id
    """,
)
def q_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands: 20-observation rolling mean ± 2 population std per
    event_type, with an upper-breach flag — the volatility-envelope
    indicator over the market-event stream. Frame sums are exact-decimal;
    the mean/std combination runs in double with the IDENTICAL expression
    tree on both engines (sqrt(20·sxx − sx²)/20), so the 6dp round and the
    breach comparison agree bit-for-bit. Scales: one ordered window per
    type, O(1) state per row, no self-join."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        "event_id",
        "value",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("ts", "event_id"))
        .alias("rn"),
    )
    w = Window.partitionBy("event_type").orderBy("rn").rowsBetween(-19, 0)
    sums = seq.select(
        "event_type",
        "event_id",
        "value",
        "rn",
        F.sum(F.col("value").cast(_DEC)).over(w).cast("double").alias("sx"),
        F.sum((F.col("value") * F.col("value")).cast(_DEC))
        .over(w)
        .cast("double")
        .alias("sxx"),
    ).filter(F.col("rn") >= 20)
    ma = F.col("sx") / 20
    sd = F.sqrt(F.lit(20) * F.col("sxx") - F.col("sx") * F.col("sx")) / 20
    upper = ma + 2 * sd
    lower = ma - 2 * sd
    return sums.select(
        "event_type",
        "event_id",
        "value",
        F.round(ma, 6).cast("double").alias("ma20"),
        F.round(upper, 6).cast("double").alias("upper_band"),
        F.round(lower, 6).cast("double").alias("lower_band"),
        (F.col("value") > upper).alias("breach_upper"),
    ).orderBy("event_type", "event_id")


@query(
    "q_join_asof_forward",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, event_id, CAST(ROUND(value, 4) AS DOUBLE) AS value
        FROM events WHERE event_type = 'click'
    ), purchases AS (
        SELECT user_id, ts AS next_purchase_ts, event_id AS next_purchase_id
        FROM events WHERE event_type = 'purchase'
    )
    SELECT c.user_id, c.ts, c.event_id, c.value,
           p.next_purchase_id, p.next_purchase_ts
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts <= p.next_purchase_ts
    """,
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each click matched to the user's NEXT purchase
    at or after it — conversion-attribution's "time to next purchase"
    shape (operators/asof.py::asof_join_forward — union + descending
    window, shuffle-once; cited parity target: DuckDB ASOF JOIN with
    l.ts <= r.ts, pandas merge_asof(direction='forward'))."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.round("value", 4).alias("value")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("ts").alias("next_purchase_ts"),
        F.col("event_id").alias("next_purchase_id"),
    )
    return asof_join_forward(
        clicks,
        purchases,
        key_cols=["user_id"],
        ts_col="ts",
        right_payload=["next_purchase_id", "next_purchase_ts"],
    )
