"""Window-function surface: ranking, lag/%-change, moving average, running
sum, ntile.

q_window_lag_change recomputes the reference's ``Change %`` column
(/root/reference/stock_data.csv col 7, produced upstream by the scraped
site) from first principles with ``lag`` — the canonical OHLCV derivation.
q_window_moving_avg is the SMA of the same domain.

Determinism: every orderBy carries a unique tie-break key (event_id /
orderkey) per SURVEY.md §2B policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stockmarketdata_dwb_etl_spark.functions.exact import portable_round
from stockmarketdata_dwb_etl_spark.catalog import load_table
from stockmarketdata_dwb_etl_spark.registry import query


@query(
    "q_window_rank",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
           CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
           CAST(RANK() OVER w AS INTEGER) AS rnk,
           CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "o_totalprice",
        F.row_number().over(w).cast("int").alias("rn"),
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
    )


@query(
    "q_window_lag_change",
    oracle="""
    SELECT event_id, user_id, ts, value,
           CAST((CAST(floor(CAST(((value - LAG(value) OVER w)
                 / nullif(LAG(value) OVER w, 0) * 100) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS pct_change
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_lag_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent change vs previous observation per user — recomputes the
    reference's 'Change %' semantics (stock_data.csv col 7; parse target at
    dump_bigq.py:124-128) from the raw series."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        portable_round((F.col("value") - prev) / F.nullif(prev, F.lit(0)) * 100, 4)
        .cast("double")
        .alias("pct_change"),
    )


@query(
    "q_window_moving_avg",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST((CAST(floor(CAST((AVG(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS sma7
    FROM events
    """,
)
def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row simple moving average per user — the SMA of the OHLCV domain."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        portable_round(F.avg("value").over(w), 4).cast("double").alias("sma7"),
    )


@query(
    "q_window_running_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST((CAST(floor(CAST((SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE)
             AS running_total
    FROM orders
    """,
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "o_orderkey",
        "o_custkey",
        portable_round(F.sum("o_totalprice").over(w), 4).cast("double").alias("running_total"),
    )


@query(
    "q_window_ntile",
    oracle="""
    SELECT c_custkey, c_acctbal,
           CAST(NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER) AS quartile
    FROM customer
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) of customers by balance — computed SCALE-SAFE: the naive
    ``ntile(4).over(Window.orderBy(...))`` funnels the whole table through
    one reducer; operators/rank.py instead range-partitions the order,
    ranks locally per partition, and stitches global positions with
    per-partition offsets (coordination over P partition counts, never
    over rows). Identical results to the SQL NTILE by construction."""
    from stockmarketdata_dwb_etl_spark.operators.rank import (
        global_row_number,
        ntile_expr,
    )

    cust = load_table(spark, sf_dir, "customer")
    ranked = global_row_number(cust, ["c_acctbal", "c_custkey"])
    return ranked.select(
        "c_custkey",
        "c_acctbal",
        ntile_expr(F.col("row_idx"), F.col("n_total"), 4).cast("int").alias("quartile"),
    )


@query(
    "q_window_dist_funcs",
    oracle="""
    SELECT event_id, event_type, value,
           CAST((CAST(floor(CAST((cume_dist() OVER wt) AS DOUBLE) * 1000000000.0 + 0.5) AS DOUBLE) / 1000000000.0) AS DOUBLE) AS cd,
           CAST((CAST(floor(CAST((percent_rank() OVER wt) AS DOUBLE) * 1000000000.0 + 0.5) AS DOUBLE) / 1000000000.0) AS DOUBLE) AS pr,
           nth_value(value, 3) OVER wu AS third_smallest,
           lead(value) OVER wo AS next_value
    FROM events
    WINDOW wt AS (PARTITION BY event_type ORDER BY value),
           wu AS (PARTITION BY event_type ORDER BY value, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wo AS (PARTITION BY event_type ORDER BY value, event_id)
    ORDER BY event_type, value, event_id
    """,
)
def q_window_dist_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining analytic-window functions in one pass: cume_dist and
    percent_rank over a TIES-REAL ordering (value only — tie groups share
    the distribution position, semantics both engines define identically
    as integer-count ratios), nth_value over a UNIQUE ordering (under ties
    'the 3rd row of the frame' is scan-order-dependent, so the frame order
    adds the event_id tie-break), and lead over the same unique order.
    All three windows share ONE event_type hash partition — a single
    shuffle, sorts reused by the window planner."""
    ev = load_table(spark, sf_dir, "events")
    wt = Window.partitionBy("event_type").orderBy("value")
    wu = (
        Window.partitionBy("event_type")
        .orderBy("value", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wo = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        "value",
        portable_round(F.cume_dist().over(wt), 9).cast("double").alias("cd"),
        portable_round(F.percent_rank().over(wt), 9).cast("double").alias("pr"),
        F.nth_value("value", 3).over(wu).alias("third_smallest"),
        F.lead("value").over(wo).alias("next_value"),
    ).orderBy("event_type", "value", "event_id")
