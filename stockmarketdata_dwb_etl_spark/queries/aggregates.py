"""Aggregation surface: global/grouped/having/distinct/stats/rollup/cube/
grouping-sets/pivot.

The reference's warehouse table exists precisely so these OLAP shapes can be
asked of the OHLCV data (SURVEY.md §2B "dwb"). All are built-in hash
aggregates — Spark plans partial (map-side) + final aggregation
automatically; nothing here hand-rolls a combiner. Floating sums/avgs use
the exact-decimal policy from functions/exact.py so results are
order-independent and match the DuckDB oracle at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockmarketdata_dwb_etl_spark.functions.exact import portable_round
from stockmarketdata_dwb_etl_spark.catalog import load_table
from stockmarketdata_dwb_etl_spark.functions.exact import (
    exact_avg,
    exact_sum,
    sql_exact_avg,
    sql_exact_sum,
)
from stockmarketdata_dwb_etl_spark.registry import query


@query(
    "q_agg_global",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS sum_linenumber,
           {sql_exact_sum('l_quantity', 'sum_qty')},
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty,
           MIN(l_shipdate) AS min_shipdate,
           MAX(l_shipdate) AS max_shipdate
    FROM lineitem
    """,
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped aggregate — single-stage partial+final, no shuffle of data
    rows (only of partial states)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_linenumber").cast("bigint")).alias("sum_linenumber"),
        exact_sum(F.col("l_quantity"), "sum_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_shipdate").alias("max_shipdate"),
    )


Q1_ORACLE = f"""
    SELECT l_returnflag, l_linestatus,
           {sql_exact_sum('l_quantity', 'sum_qty')},
           {sql_exact_sum('l_extendedprice', 'sum_base_price')},
           {sql_exact_sum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {sql_exact_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {sql_exact_avg('l_quantity', 'avg_qty')},
           {sql_exact_avg('l_extendedprice', 'avg_price')},
           {sql_exact_avg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
"""


@query("q_agg_groupby", oracle=Q1_ORACLE)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — the flagship: scan → filter → hash-agg over
    (returnflag, linestatus). The canonical partial+final aggregation;
    filter and the 7-column projection are pushed into the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum(F.col("l_quantity"), "sum_qty"),
            exact_sum(F.col("l_extendedprice"), "sum_base_price"),
            exact_sum(disc_price, "sum_disc_price"),
            exact_sum(charge, "sum_charge"),
            exact_avg(F.col("l_quantity"), "avg_qty"),
            exact_avg(F.col("l_extendedprice"), "avg_price"),
            exact_avg(F.col("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q_agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) > 10
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 10)
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_custs,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count-distinct — Spark expands to a two-phase agg (distinct
    then count) automatically."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_custs"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "q_agg_stats",
    oracle="""
    SELECT c_mktsegment,
           CAST((CAST(floor(CAST((AVG(c_acctbal)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS avg_bal,
           CAST((CAST(floor(CAST((STDDEV_SAMP(c_acctbal)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS sd_bal,
           CAST((CAST(floor(CAST((VAR_SAMP(c_acctbal)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS var_bal,
           MIN(c_acctbal) AS min_bal,
           MAX(c_acctbal) AS max_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        portable_round(F.avg("c_acctbal"), 4).cast("double").alias("avg_bal"),
        portable_round(F.stddev_samp("c_acctbal"), 4).cast("double").alias("sd_bal"),
        portable_round(F.var_samp("c_acctbal"), 4).cast("double").alias("var_bal"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
    )


@query(
    "q_rollup",
    oracle=f"""
    SELECT r_name, n_name,
           {sql_exact_sum('c_acctbal', 'sum_bal')},
           COUNT(*) AS n_custs
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(region, nation) over the dimension join — dims broadcast."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        exact_sum(F.col("c_acctbal"), "sum_bal"),
        F.count(F.lit(1)).alias("n_custs"),
    )


@query(
    "q_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@query(
    "q_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           {sql_exact_sum('o_totalprice', 'sum_price')},
           CAST(GROUPING(o_orderstatus) AS INTEGER) * 2
             + CAST(GROUPING(o_orderpriority) AS INTEGER) AS gid
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id — via spark.sql on a temp
    view (the DataFrame API has no grouping-sets verb pre-4.0 groupingSets).
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST((CAST(floor(CAST((SUM(CAST(o_totalprice AS DECIMAL(38,6)))) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS sum_price,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT) AS gid
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


@query(
    "q_pivot",
    oracle="""
    SELECT user_id,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS click,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'error' THEN 1 END), 0) AS BIGINT) AS error,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS purchase,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'signup' THEN 1 END), 0) AS BIGINT) AS signup,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 END), 0) AS BIGINT) AS view
    FROM events
    GROUP BY user_id
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot events to user × event_type counts, lowered to conditional
    aggregation (one sum(CASE WHEN type=k) per declared pivot value).
    ``DataFrame.pivot(values)`` compiles to TWO aggregates — a
    (user_id, event_type) pre-count shuffle feeding a pivotfirst shuffle
    on user_id — which is the right generic plan for an unbounded value
    list, but when the columns are small and DECLARED (the only
    scale-safe pivot: an implicit pivot adds a distinct-values job over
    the full table) the conditional-agg form needs ONE user_id shuffle
    with map-side partials: measured 0.38 s -> 0.27 s warm at sf0.1 and
    one fewer exchange, the shape that holds at 100 TB. This is also the
    round-5 q_pivot drift fix (0.33 -> 0.51 s across the re-chunked
    landing: the extra pre-agg exchange amplified the wider scan's task
    overhead)."""
    ev = load_table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    return ev.groupBy("user_id").agg(
        *[
            F.coalesce(F.sum(F.when(F.col("event_type") == k, 1)), F.lit(0))
            .cast("bigint")
            .alias(k)
            for k in kinds
        ]
    )


@query(
    "q_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, rk FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY p_brand
                   ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS rk
        FROM part)
    WHERE rk <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per group via ranked window + filter — Spark pushes a per-group
    limit (WindowGroupLimit) so each partition keeps only k rows pre-shuffle."""
    from pyspark.sql.window import Window

    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        part.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


@query(
    "q_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS median_ok,
           TRUE AS p90_ok
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles per group (Greenwald-Khanna sketch, accuracy
    10000): the scale path for quantiles where the exact interpolated
    percentile (q_agg_percentile) would need a full sort per group — the
    sketch is mergeable, so partial aggregation works and the shuffle
    carries one sketch per group, not the data.

    The sketch values themselves are engine-internal, so the checkable
    output is the ERROR BOUND: |approx − exact| ≤ 1.0 quantity unit per
    group (far looser than GK's rank-ε guarantee at accuracy 10000 yet
    tight enough to catch a broken sketch). The oracle asserts both bounds
    hold for every group."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_quantity", 0.5, 10000).alias("approx_median"),
            F.percentile_approx("l_quantity", 0.9, 10000).alias("approx_p90"),
            F.percentile("l_quantity", 0.5).alias("exact_median"),
            F.percentile("l_quantity", 0.9).alias("exact_p90"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            "l_returnflag",
            "n_rows",
            (F.abs(F.col("approx_median") - F.col("exact_median")) <= 1.0).alias(
                "median_ok"
            ),
            (F.abs(F.col("approx_p90") - F.col("exact_p90")) <= 1.0).alias("p90_ok"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_agg_mode_disc",
    oracle="""
    WITH counts AS (
        SELECT l_returnflag, l_quantity, COUNT(*) AS c
        FROM lineitem GROUP BY l_returnflag, l_quantity
    ), modes AS (
        SELECT l_returnflag, l_quantity AS mode_qty,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY c DESC, l_quantity) AS rn
        FROM counts
    )
    SELECT q.l_returnflag,
           m.mode_qty,
           CAST(quantile_disc(q.l_quantity, 0.5) AS DOUBLE) AS median_disc,
           CAST(quantile_disc(q.l_quantity, 0.25) AS DOUBLE) AS p25_disc
    FROM lineitem q
    JOIN modes m ON q.l_returnflag = m.l_returnflag AND m.rn = 1
    GROUP BY q.l_returnflag, m.mode_qty
    """,
)
def q_agg_mode_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete (non-interpolating) inverse-distribution aggregates:
    percentile_disc WITHIN GROUP picks an ACTUAL data value at each rank
    (vs q_agg_percentile's interpolating percentile_cont), and the mode is
    computed via count + row_number with a smallest-value tie-break —
    Spark's native mode() keeps an arbitrary value under ties, which a
    differential gate cannot accept. One extra shuffle for the mode
    ranking; the disc percentiles ride the same hash aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    from pyspark.sql.window import Window

    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("c").desc(), F.col("l_quantity")
    )
    modes = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"))
    )
    return (
        li.join(F.broadcast(modes), "l_returnflag")
        .groupBy("l_returnflag", "mode_qty")
        .agg(
            F.expr(
                "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)"
                " AS DOUBLE)"
            ).alias("median_disc"),
            F.expr(
                "CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)"
                " AS DOUBLE)"
            ).alias("p25_disc"),
        )
    )


@query(
    "q_percentile_cont",
    oracle="""
    WITH q AS (
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, [0.25, 0.5, 0.75]) AS qs
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(u.p AS DOUBLE) AS p,
           CAST((CAST(floor(CAST((u.v) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS price_quantile
    FROM q, LATERAL (
        SELECT unnest([0.25, 0.5, 0.75]) AS p, unnest(qs) AS v
    ) u
    ORDER BY l_returnflag, p
    """,
)
def q_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (PERCENTILE_CONT semantics) per
    return flag: Spark's ``percentile`` aggregate computes the linearly
    interpolated quantile a + (b−a)·frac over the sorted group — the
    same interpolation tree DuckDB's quantile_cont uses, so float64
    agrees before the 4dp round. Complements q_approx_percentile (the
    sketch path) and q_percentile_disc (the discrete path): this is the
    exact path, which at 100 TB costs a per-group sort — the documented
    trade-off the approx variant exists to avoid. One partial+final agg
    keyed by the 3-value flag; the quantile array explodes to rows
    map-side after the agg."""
    li = load_table(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(
        F.expr(
            "percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))"
        ).alias("qs")
    )
    ps = F.array([F.lit(p) for p in (0.25, 0.5, 0.75)])
    return (
        q.select(
            "l_returnflag",
            F.explode(F.arrays_zip(ps.alias("p"), F.col("qs").alias("v"))).alias(
                "u"
            ),
        )
        .select(
            "l_returnflag",
            F.col("u.p").cast("double").alias("p"),
            portable_round(F.col("u.v"), 4).cast("double").alias("price_quantile"),
        )
        .orderBy("l_returnflag", "p")
    )


@query(
    "q_partial_agg_merge",
    oracle="""
    WITH partials AS (
        SELECT event_type AS symbol,
               date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               SUM(CAST(value AS DECIMAL(38,6))) AS vsum,
               MIN(value) AS vmin,
               MAX(value) AS vmax
        FROM events GROUP BY 1, 2
    )
    SELECT symbol,
           CAST(COUNT(*) AS BIGINT) AS n_partials,
           CAST(SUM(cnt) AS BIGINT) AS total_cnt,
           CAST((CAST(floor(CAST((CAST(SUM(vsum) AS DOUBLE)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS total_value,
           MIN(vmin) AS vmin,
           MAX(vmax) AS vmax,
           CAST((CAST(floor(CAST((CAST(SUM(vsum) AS DOUBLE) / SUM(cnt)) AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS DOUBLE)
               AS mean_value
    FROM partials GROUP BY symbol ORDER BY symbol
    """,
)
def q_partial_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable partial-aggregate rollup — the two-level re-aggregation
    pattern that makes 100 TB rollups cheap: level 1 reduces raw ticks
    to per-(symbol, day) algebraic states (count, exact-decimal sum,
    min, max); level 2 merges states WITHOUT touching raw data (counts
    and sums add, min/max fold — every state is a commutative monoid,
    so daily partials materialized once serve weekly/monthly/total
    rollups forever after). The decimal sum is what makes the merge
    exactly associative — double partials would drift per merge order.
    Scales: the full-data shuffle happens once at level 1; level 2
    shuffles only the day-grain state table (calendar-bounded)."""
    ev = load_table(spark, sf_dir, "events")
    partials = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("day", F.col("ts")).alias("day"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("vsum"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    return (
        partials.groupBy("symbol")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_partials"),
            F.sum("cnt").cast("bigint").alias("total_cnt"),
            F.sum("vsum").alias("__vsum"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
        .select(
            "symbol",
            "n_partials",
            "total_cnt",
            portable_round(F.col("__vsum").cast("double"), 4)
            .cast("double")
            .alias("total_value"),
            "vmin",
            "vmax",
            portable_round(
                F.col("__vsum").cast("double") / F.col("total_cnt"), 6
            )
            .cast("double")
            .alias("mean_value"),
        )
        .orderBy("symbol")
    )


@query(
    "q_agg_filtered",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) FILTER (WHERE o_totalprice > 150000) AS BIGINT)
               AS n_high,
           CAST((CAST(floor(CAST((CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                               FILTER (WHERE o_orderstatus = 'O'), 0)
                           AS DOUBLE)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS open_revenue,
           CAST(COUNT(DISTINCT o_custkey)
                    FILTER (WHERE EXTRACT(year FROM o_orderdate) = 1996)
                AS BIGINT) AS custs_1996
    FROM orders
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation — SQL FILTER-clause semantics: one pass
    over orders computing, per priority, the total count, a filtered
    count, a filtered exact-decimal revenue sum (COALESCE 0 when no row
    qualifies, matching the SQL convention), and a filtered distinct
    count. Each FILTER compiles to when(cond, x) inside the aggregate —
    no self-joins, no second scan; the distinct branch plans the
    standard two-phase expand. This is the pattern that replaces N
    per-condition subqueries with one shuffle at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.count(F.when(F.col("o_totalprice") > 150000, 1))
            .cast("bigint")
            .alias("n_high"),
            portable_round(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("o_orderstatus") == "O",
                            F.col("o_totalprice").cast("decimal(38,6)"),
                        )
                    ),
                    F.lit(0).cast("decimal(38,6)"),
                ).cast("double"),
                4,
            )
            .cast("double")
            .alias("open_revenue"),
            F.count_distinct(
                F.when(
                    F.year("o_orderdate") == 1996, F.col("o_custkey")
                )
            )
            .cast("bigint")
            .alias("custs_1996"),
        )
        .orderBy("o_orderpriority")
    )
