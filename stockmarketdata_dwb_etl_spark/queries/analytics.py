"""Composite analytics surface: ordered-set / boolean / bitwise aggregates,
scalar subqueries, TPC-H-shaped multi-join reports, JSON map explosion, a
JSON source/sink roundtrip, and advanced window frames.

These are the query shapes the reference's warehouse exists to serve
(SURVEY.md §2B "dwb"): after the OHLCV table lands in BigQuery the analyst
asks exactly these — medians, top-revenue drilldowns, above-average scans.
Everything is built-in Catalyst operators; the multi-join reports lean on
broadcast dims + AQE for join strategy.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stockmarketdata_dwb_etl_spark.functions.exact import portable_round
from stockmarketdata_dwb_etl_spark.catalog import load_table
from stockmarketdata_dwb_etl_spark.functions.exact import exact_sum, sql_exact_sum
from stockmarketdata_dwb_etl_spark.registry import query
from stockmarketdata_dwb_etl_spark.scratch import fixture_tag

SCRATCH = "/root/repo/.scratch"


@query(
    "q_agg_percentile",
    oracle="""
    SELECT l_returnflag,
           CAST((CAST(floor(CAST((quantile_cont(l_quantity, 0.5)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS median_qty,
           CAST((CAST(floor(CAST((quantile_cont(l_quantity, 0.9)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS p90_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group — Spark `percentile` and
    DuckDB `quantile_cont` both interpolate linearly at rank (n-1)·p.

    Both percentiles come from ONE array-form ``percentile`` aggregate:
    the exact percentile's buffer is a value→count map per group, so two
    scalar aggregates would build and merge that map twice; the array
    form maintains it once and reads both ranks out of the same sorted
    counts (measured ~27% faster at sf0.1, r04 profiling of the r01→r03
    0.263→0.392 s drift — the remainder was boot-to-boot noise)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", F.array(F.lit(0.5), F.lit(0.9))).alias("pcts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            "l_returnflag",
            portable_round(F.col("pcts")[0], 4).alias("median_qty"),
            portable_round(F.col("pcts")[1], 4).alias("p90_qty"),
            "n_rows",
        )
    )


@query(
    "q_agg_listagg",
    oracle="""
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n_nations
    FROM region JOIN nation ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): collect_list sorted then
    joined — deterministic because the order is total."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return (
        region.join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@query(
    "q_agg_bool_bitwise",
    oracle="""
    SELECT event_type,
           bool_and(value > 50.0) AS all_gt50,
           bool_or(value > 50.0) AS any_gt50,
           CAST(bit_or(user_id) AS BIGINT) AS or_users,
           CAST(bit_xor(event_id) AS BIGINT) AS xor_events,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_bool_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean (every/any) and bitwise (or/xor) aggregates — all
    order-independent, so no determinism policy needed."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bool_and(F.col("value") > 50.0).alias("all_gt50"),
        F.bool_or(F.col("value") > 50.0).alias("any_gt50"),
        F.bit_or("user_id").alias("or_users"),
        F.bit_xor("event_id").alias("xor_events"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_scalar_subquery",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_above
    FROM orders
    WHERE o_totalprice > (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(*) FROM orders)
    GROUP BY o_orderpriority
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery filter (orders above the global average price): the
    1-row aggregate is broadcast-joined — no collect, the same plan a
    correlated rewrite would produce. The average is computed with the
    exact-decimal policy so the comparison boundary is engine-independent."""
    orders = load_table(spark, sf_dir, "orders")
    avg_price = orders.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_price")
    )
    return (
        orders.join(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_above"))
    )


@query(
    "q_tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           {sql_exact_sum("l_extendedprice * (1 - l_discount)", "revenue")},
           CAST(o_orderdate AS DATE) AS order_date,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
      AND l_shipdate > TIMESTAMP '1997-06-30 00:00:00'
    GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority) on the fixture schema: filtered
    customer dim broadcast into orders⨝lineitem, hash-agg on orderkey,
    TakeOrdered top-10 by revenue. Filters push into all three scans."""
    cutoff = "1997-06-30 00:00:00"
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "l_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            "o_orderpriority",
        )
        .agg(exact_sum(revenue, "revenue"))
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q_tpch_q5",
    oracle=f"""
    SELECT n_name,
           {sql_exact_sum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): 6-table join where every dim side
    (supplier, nation, region) is broadcast — only the orders⨝lineitem
    equi-join shuffles, and AQE may broadcast that too at small sf. The
    c_nationkey = s_nationkey clause is the 'local' join condition."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(exact_sum(revenue, "revenue"))
        .orderBy(F.col("revenue").desc())
    )


@query(
    "q_props_map",
    oracle="""
    WITH kv AS (
        SELECT unnest(json_keys(props)) AS prop_key, props FROM events
    )
    SELECT prop_key,
           COUNT(*) AS n,
           CAST(SUM(TRY_CAST(json_extract_string(props, '$.' || prop_key)
                AS INTEGER)) AS BIGINT) AS sum_val,
           MIN(TRY_CAST(json_extract_string(props, '$.' || prop_key)
                AS INTEGER)) AS min_val,
           MAX(TRY_CAST(json_extract_string(props, '$.' || prop_key)
                AS INTEGER)) AS max_val
    FROM kv
    GROUP BY prop_key
    """,
)
def q_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured explosion: parse the JSON props column into a typed
    map, explode to (key, value) rows, aggregate per key — from_json +
    explode stay JVM-side (no UDF)."""
    ev = load_table(spark, sf_dir, "events")
    kv = ev.select(
        F.explode(F.from_json("props", "map<string,int>")).alias("prop_key", "val")
    )
    return kv.groupBy("prop_key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("val").cast("bigint")).alias("sum_val"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


# NTZ serialization format (no zone offset — ts is TIMESTAMP_NTZ); applied
# via timestampNTZFormat, which is the option JSON read/write consults for
# the NTZ type (timestampFormat governs only TIMESTAMP_LTZ columns).
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


@query(
    "q_json_source",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           {sql_exact_sum("value", "sum_value")},
           MAX(ts) AS max_ts
    FROM events
    GROUP BY event_type
    """,
)
def q_json_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + source roundtrip (ref S10/S11 generalized to a
    second text format): write events as JSONL with microsecond timestamps,
    read back with an explicit schema, aggregate — values and timestamps
    must survive the text roundtrip bit-exactly."""
    from stockmarketdata_dwb_etl_spark.streaming.jobs import EVENTS_SCHEMA

    tag = fixture_tag(sf_dir)
    out = os.path.join(SCRATCH, "events_json", tag)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            load_table(spark, sf_dir, "events")
            .write.mode("overwrite")
            .option("timestampNTZFormat", _TS_FMT)
            .json(out)
        )
    back = (
        spark.read.schema(EVENTS_SCHEMA).option("timestampNTZFormat", _TS_FMT).json(out)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum(F.col("value"), "sum_value"),
        F.max("ts").alias("max_ts"),
    )


@query(
    "q_approx_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS approx_ok
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct users per event type — the
    sketch-based path for cardinalities where exact count(DISTINCT) would
    shuffle every value. The HLL register values are engine-internal, so
    the checkable output is the ERROR BOUND: |approx − exact| ≤ 5% of
    exact per group (5× the sketch's 1% rsd), asserted TRUE by the
    oracle, alongside the exact count which must hash-match."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("__approx"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("__approx") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("approx_ok"),
        )
        .orderBy("event_type")
    )


@query(
    "q_window_first_last",
    oracle="""
    SELECT event_id, user_id,
           first_value(value) OVER w AS first_val,
           last_value(value) OVER w AS last_val,
           nth_value(value, 2) OVER w AS second_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value over a full-partition frame (explicit, because
    the default last_value frame is the running row)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.first_value("value").over(w).alias("first_val"),
        F.last_value("value").over(w).alias("last_val"),
        F.nth_value("value", 2).over(w).alias("second_val"),
    )


@query(
    "q_window_range_frame",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_last_hour,
           CAST((CAST(floor(CAST((SUM(CAST(value AS DECIMAL(38,6))) OVER w) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE)
             AS sum_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event-time seconds: per event, count+sum of the
    user's events in the trailing hour — the time-decayed-feature shape.
    Peers (same second) share frame results in both engines; the sum uses
    the exact-decimal policy because frame accumulation order differs."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        # epoch seconds from the naive epoch: session-tz-independent on the
        # NTZ ts and equal to the oracle's floor(epoch(ts)) for ts >= 1970
        .orderBy(
            F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
        )
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        portable_round(F.sum(F.col("value").cast("decimal(38,6)")).over(w), 4)
        .cast("double")
        .alias("sum_last_hour"),
    )


@query(
    "q_funnel",
    oracle="""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts >= s1.t1
        GROUP BY e.user_id
    ), s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
        GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM s1) AS n_signup,
           (SELECT COUNT(*) FROM s2) AS n_click_after_signup,
           (SELECT COUNT(*) FROM s3) AS n_purchase_after_click
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (signup → click → purchase, each stage
    strictly after the previous per user) — the event-sequence shape of
    product analytics. Three stage aggregations chained by join; each
    stage shuffles on user_id only."""
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_click_after_signup")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_purchase_after_click")))
    )


_PROFILE_COLS = (
    "o_orderstatus",
    "o_orderpriority",
    "o_totalprice",
    "o_custkey",
)


@query(
    "q_profile_table",
    oracle="""
    SELECT 'o_orderstatus' AS column_name,
           CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'o_custkey',
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders
    """,
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler (data-quality surface): null count + exact distinct
    per column, one output row per column — computed in a SINGLE pass over
    the table (one wide aggregate, then unpivoted), where the naive form
    scans once per column."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"))
        aggs.append(F.countDistinct(c).alias(f"{c}__distinct"))
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct" for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) "
            "AS (column_name, n_nulls, n_distinct)"
        )
    )


@query(
    "q_window_pct_rank",
    oracle="""
    SELECT c_custkey,
           CAST((CAST(floor(CAST((percent_rank() OVER w) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS pct_rank,
           CAST((CAST(floor(CAST((cume_dist() OVER w) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS cume,
           CAST(ntile(10) OVER w AS INTEGER) AS decile
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
)
def q_window_pct_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank/cume_dist/ntile) over a
    total order — the percentile-assignment shape of cohort scoring —
    computed SCALE-SAFE via operators/rank.py: range-partitioned global
    row numbering (no unpartitioned window, no single-reducer sort), with
    the distribution functions derived arithmetically from (row_idx,
    n_total). The ordering is unique (custkey tie-break), so row_number
    == rank and the closed forms match SQL semantics exactly."""
    from stockmarketdata_dwb_etl_spark.operators.rank import (
        cume_dist_expr,
        global_row_number,
        ntile_expr,
        percent_rank_expr,
    )

    cust = load_table(spark, sf_dir, "customer")
    ranked = global_row_number(cust, ["c_acctbal", "c_custkey"])
    r, n = F.col("row_idx"), F.col("n_total")
    return ranked.select(
        "c_custkey",
        portable_round(percent_rank_expr(r, n), 4).alias("pct_rank"),
        portable_round(cume_dist_expr(r, n), 4).alias("cume"),
        ntile_expr(r, n, 10).cast("int").alias("decile"),
    )


@query(
    "q_agg_histogram",
    oracle="""
    -- no width_bucket in this DuckDB build: same arithmetic spelled out;
    -- (600000-0)/12 = 50000.0 is exact so the division matches Spark's
    SELECT CAST(CASE WHEN o_totalprice < 0.0 THEN 0
                     ELSE floor(o_totalprice / 50000.0) + 1 END AS INTEGER)
             AS bucket,
           COUNT(*) AS n,
           CAST((CAST(floor(CAST((MIN(o_totalprice)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS lo,
           CAST((CAST(floor(CAST((MAX(o_totalprice)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket + hash-agg — one scan, one
    shuffle of 14 tiny groups regardless of input size."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(600000.0), F.lit(12))
            .cast("int")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            portable_round(F.min("o_totalprice"), 4).alias("lo"),
            portable_round(F.max("o_totalprice"), 4).alias("hi"),
        )
    )


@query(
    "q_decile_assign",
    oracle="""
    WITH b AS (
        SELECT quantile_cont(c_acctbal,
               [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
        FROM customer
    )
    SELECT c_custkey,
           CAST(1 + len(list_filter(qs, q -> q < c_acctbal)) AS INTEGER)
             AS decile
    FROM customer, b
    """,
)
def q_decile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable decile assignment — the 100 TB replacement for a global
    ntile (SCALE.md gap 1): boundaries are ONE 1-row percentile aggregate,
    broadcast to a map-side bucket comparison. No global sort, no single
    reducer; ties land deterministically (count of boundaries strictly
    below the value) in both engines."""
    cust = load_table(spark, sf_dir, "customer")
    fracs = [i / 10 for i in range(1, 10)]
    bounds = cust.agg(F.percentile("c_acctbal", F.lit(fracs)).alias("qs"))
    return cust.join(F.broadcast(bounds)).select(
        "c_custkey",
        (
            1 + F.size(F.filter("qs", lambda q: q < F.col("c_acctbal")))
        )
        .cast("int")
        .alias("decile"),
    )


@query(
    "q_sql_text",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST((CAST(floor(CAST((SUM(CAST(o_totalprice AS DECIMAL(38,6)))) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE)
             AS sum_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o_orderpriority
    """,
)
def q_sql_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-text front door: the reference delegates its query surface
    to BigQuery SQL (that is what the warehouse is FOR); this engine
    accepts the same ANSI SQL directly via spark.sql over the registered
    catalog views (catalog.register_views) — same Catalyst plan as the
    DataFrame DSL, one parser in front."""
    from stockmarketdata_dwb_etl_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST((CAST(floor(CAST((SUM(CAST(o_totalprice AS DECIMAL(38,6)))) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE)
                 AS sum_price
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o_orderpriority
        """
    )


@query(
    "q_cohort_retention",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, MIN(date_trunc('month', ts)) AS cohort FROM events
        GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT e.user_id, f.cohort,
               datediff('month', f.cohort, date_trunc('month', e.ts)) AS month_n
        FROM events e JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT cohort,
           CAST(COUNT(DISTINCT CASE WHEN month_n = 0 THEN user_id END) AS BIGINT) AS m0,
           CAST(COUNT(DISTINCT CASE WHEN month_n = 1 THEN user_id END) AS BIGINT) AS m1,
           CAST(COUNT(DISTINCT CASE WHEN month_n = 2 THEN user_id END) AS BIGINT) AS m2
    FROM activity
    GROUP BY cohort
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen month, counted
    in each subsequent month — first-seen agg joined back on user_id, then
    a conditional-count pivot (fixed month columns so the schema is stable
    for the oracle)."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("month", "ts")).alias("cohort")
    )
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort",
            (
                (F.year(F.date_trunc("month", "ts")) - F.year("cohort")) * 12
                + (F.month(F.date_trunc("month", "ts")) - F.month("cohort"))
            ).alias("month_n"),
        )
        .distinct()
    )
    m = lambda k: F.countDistinct(  # noqa: E731
        F.when(F.col("month_n") == k, F.col("user_id"))
    ).alias(f"m{k}")
    return activity.groupBy("cohort").agg(m(0), m(1), m(2))
