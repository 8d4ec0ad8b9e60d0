"""Third report battery: the remaining TPC-H-shaped analytics runnable on
the fixture schema (no partsupp table; Q2/Q9/Q11/Q16/Q20 are out of
scope). Queries whose official form needs columns the fixtures lack
(l_shipmode, l_commitdate/l_receiptdate, p_container, c_phone) keep the
STRUCTURE — the join/subquery/aggregation shape that stresses the
optimizer — with the predicate rebased onto available columns; each
docstring states the adaptation.

Like every report here, these are the analyst queries the reference
delegates to BigQuery after load (/root/reference/dump_bigq.py:135-149);
the engine runs them natively on the warehouse tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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
    "q_sample_stratified",
    oracle="""
    WITH rated AS (
        SELECT doc_id, source, n_chars,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::INTEGER
                 AS bucket,
               CASE WHEN CAST(substr(source, 4) AS INTEGER) < 5 THEN 205
                    WHEN CAST(substr(source, 4) AS INTEGER) < 10 THEN 102
                    ELSE 26 END AS keep_below
        FROM documents
    )
    SELECT doc_id, source, n_chars FROM rated WHERE bucket < keep_below
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible stratified sampling — the corpus-curation primitive for
    mixing sources at different rates (e.g. books 80%, web 10%) in a
    training-data pipeline. Per-stratum keep rates (~80%/40%/10% by source
    tier) are applied as a map-side md5-bucket comparison: join-free, no
    persisted sample table, and the SAME rows are kept on any engine, any
    cluster size, any run — unlike rand()-based sampleBy, which cannot be
    replayed or audited. Scales as a pure projection+filter over the scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10).cast(
        "int"
    )
    tier = F.substring("source", 4, 10).cast("int")
    keep_below = (
        F.when(tier < 5, 205).when(tier < 10, 102).otherwise(26)
    )
    return docs.filter(bucket < keep_below).select("doc_id", "source", "n_chars")


@query(
    "q_tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_exact_sum("l_quantity", "sum_qty")},
           {sql_exact_sum("l_extendedprice", "sum_base_price")},
           {sql_exact_sum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
           {sql_exact_sum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
           {sql_exact_avg("l_quantity", "avg_qty")},
           {sql_exact_avg("l_extendedprice", "avg_price")},
           {sql_exact_avg("l_discount", "avg_disc")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report): the canonical scan→filter→
    wide-aggregate. One pass over lineitem, 8 aggregates computed in the
    same partial+final hash-agg, 6 output groups — reducer memory is
    bounded by group count, not rows, at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    price, disc, tax = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum(F.col("l_quantity"), "sum_qty"),
            exact_sum(price, "sum_base_price"),
            exact_sum(price * (1 - disc), "sum_disc_price"),
            exact_sum(price * (1 - disc) * (1 + tax), "sum_charge"),
            exact_avg(F.col("l_quantity"), "avg_qty"),
            exact_avg(price, "avg_price"),
            exact_avg(disc, "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) > 30
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): correlated EXISTS → left-semi
    join. Adaptation: the fixture lacks l_commitdate/l_receiptdate, so
    "late" is l_shipdate more than 30 days after o_orderdate — the same
    exists-one-late-lineitem structure. The semi join keeps orders narrow
    (no row multiplication however many lineitems match), and the quarter
    filter pushes into the orders scan."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 30),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q_tpch_q7",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_exact_sum("volume", "revenue")}
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): 6-table join with a disjunctive
    cross-nation predicate. Both nation legs broadcast (dim-sized), the
    disjunction is applied after the two broadcast hash joins; lineitem —
    the only fact-scale table — shuffles once for the orders join and the
    date filter pushes into its scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(exact_sum(F.col("volume"), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q_tpch_q8",
    oracle="""
    SELECT o_year,
           CAST((CAST(floor(CAST((CAST(SUM(CAST(CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END
                             AS DECIMAL(38,6))) AS DOUBLE)
             / CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): 8-table star join + conditional
    aggregation ratio. Every dimension broadcasts; the part filter (1/6 of
    p_type) prunes lineitem FIRST via the broadcast hash join so the
    orders shuffle carries only matching line items. The share divides two
    exact-decimal sums as doubles — same op order as the oracle."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    joined = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "nation",
        )
    )
    dec = "decimal(38,6)"
    target = F.when(F.col("nation") == "NATION_2", F.col("volume")).otherwise(0.0)
    return (
        joined.groupBy("o_year")
        .agg(
            F.sum(target.cast(dec)).cast("double").alias("__num"),
            F.sum(F.col("volume").cast(dec)).cast("double").alias("__den"),
        )
        .select(
            "o_year",
            portable_round(F.col("__num") / F.col("__den"), 4).cast("double").alias("mkt_share"),
        )
        .orderBy("o_year")
    )


@query(
    "q_tpch_q12",
    oracle="""
    SELECT ship_speed,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (
        SELECT o_orderpriority,
               CASE WHEN CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) > 90
                    THEN 'SLOW' ELSE 'FAST' END AS ship_speed
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY ship_speed
    ORDER BY ship_speed
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping-priority correlation): join + CASE-bucketed
    conditional counts. Adaptation: the fixture lacks l_shipmode, so the
    bucket is shipping latency (> 90 days after order = SLOW) — same
    join-then-pivot-by-CASE structure. The year filter pushes into the
    lineitem scan before the orders join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.when(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90, "SLOW"
            )
            .otherwise("FAST")
            .alias("ship_speed"),
            high.alias("__high"),
        )
        .groupBy("ship_speed")
        .agg(
            F.sum(F.when(F.col("__high"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~F.col("__high"), 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_speed")
    )


@query(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer
        LEFT JOIN orders ON o_custkey = c_custkey
                        AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): left join with an
    extra join-side predicate, then a two-level aggregation. Adaptation:
    the order filter is on o_orderpriority (the fixture lacks o_comment).
    COUNT(o_orderkey) over the left join counts 0 for order-less
    customers — the outer join preserves them. The second groupBy is over
    the tiny (customer-count-distinct) distribution."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q_tpch_q15",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {sql_exact_sum("l_extendedprice * (1 - l_discount)", "total_revenue")}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): aggregate view + scalar-subquery max
    selection. The quarter's per-supplier revenue is computed once,
    PERSISTED (~|supplier| rows), and consumed twice (the max and the
    equality filter) — ReuseExchange does not canonicalize the two agg
    branches together (verified on the executed plan), so without the
    persist the lineitem scan+agg would run twice. The 1-row max
    broadcasts into the filter. Equality compares the 4-dp-rounded
    revenue on both sides, so the tie set is deterministic across
    engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    from stockmarketdata_dwb_etl_spark.operators.cache import bounded_persist

    revenue = bounded_persist(
        li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "total_revenue",
            )
        ),
        "q15-revenue",
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("__max_rev"))
        .join(supp, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q_tpch_q17",
    oracle="""
    SELECT CAST((CAST(floor(CAST((CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1' AND p_size <= 10
      AND l_quantity < (
          SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): correlated AVG subquery
    per part. Adaptation: the part filter is p_brand + p_size (no
    p_container in fixtures). The per-part average joins back
    broadcast-style after aggregation — two passes over the filtered
    lineitem, never a per-row subquery execution. Result is the decimal
    sum divided by 7.0 as double, matching the oracle's op order."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10)
    )
    branded = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    # correlated subquery scope is ALL lineitems of the part (unfiltered)
    per_part = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("__qty_thresh")
    )
    small = branded.join(
        F.broadcast(per_part), F.col("l_partkey") == F.col("__pk")
    ).filter(F.col("l_quantity") < F.col("__qty_thresh"))
    return small.agg(
        portable_round(
            F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double") / 7.0,
            4,
        )
        .cast("double")
        .alias("avg_yearly")
    )


@query(
    "q_tpch_q19",
    oracle=f"""
    SELECT {sql_exact_sum("l_extendedprice * (1 - l_discount)", "revenue")},
           COUNT(*) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicates): the OR-of-
    ANDs join predicate that defeats naive pushdown. Adaptation: predicate
    triplets use p_brand/p_size/l_quantity (no p_container/l_shipmode in
    fixtures). Spark evaluates the disjunction post-join after a plain
    equi broadcast join on partkey — the join stays hash-based; only the
    residual filter is disjunctive."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    b, s, q = F.col("p_brand"), F.col("p_size"), F.col("l_quantity")
    disj = (
        ((b == "Brand#1") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#2") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#3") & s.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(disj)
        .agg(
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q_tpch_q21",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND CAST(l1.l_shipdate AS DATE) - CAST(o_orderdate AS DATE) > 60
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND CAST(l3.l_shipdate AS DATE) - CAST(o3.o_orderdate AS DATE) > 60
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): the EXISTS +
    NOT-EXISTS double correlation. Adaptation: "late" is shipping > 60
    days after the order date (no l_receiptdate/l_commitdate in
    fixtures). The exists legs become left-semi / left-anti joins on
    orderkey with a supplier-inequality condition — each a single
    key-partitioned shuffle, no row explosion; top-20 via TakeOrdered."""
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    l1 = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.datediff("l_shipdate", "o_orderdate") > 60)
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    late_others = l1.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    waited = (
        l1.join(
            others,
            (F.col("k2") == F.col("l_orderkey")) & (F.col("s2") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("k3") == F.col("l_orderkey")) & (F.col("s3") != F.col("l_suppkey")),
            "left_anti",
        )
    )
    return (
        waited.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "q_tpch_q22",
    oracle="""
    WITH eligible AS (
        SELECT c_custkey, c_nationkey % 10 AS cntrycode, c_acctbal
        FROM customer
        WHERE c_nationkey % 10 IN (1, 2, 3, 4, 5)
    ), threshold AS (
        SELECT AVG(c_acctbal) AS avg_bal FROM eligible WHERE c_acctbal > 0.0
    )
    SELECT CAST(cntrycode AS BIGINT) AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST((CAST(floor(CAST((SUM(CAST(c_acctbal AS DECIMAL(38,6)))) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE)
             AS totacctbal
    FROM eligible, threshold
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (
          SELECT 1 FROM orders WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): scalar-average threshold +
    NOT EXISTS anti join. Adaptations: the country code is c_nationkey %
    10 (no c_phone in fixtures), and "no orders" is "no orders since
    2000-01-01" — every fixture customer has at least one lifetime order,
    so the official predicate would be vacuously empty; the dormant-
    customer form keeps the anti join non-trivial at every sf. The
    average broadcasts as a 1-row cross join; the NOT EXISTS is a
    left-anti join on custkey — one shuffle, no subquery re-execution."""
    cust = load_table(spark, sf_dir, "customer")
    eligible = cust.filter((F.col("c_nationkey") % 10).isin(1, 2, 3, 4, 5)).select(
        "c_custkey", (F.col("c_nationkey") % 10).alias("cntrycode"), "c_acctbal"
    )
    threshold = eligible.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return (
        eligible.join(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            portable_round(F.sum(F.col("c_acctbal").cast("decimal(38,6)")), 4)
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@query(
    "q_streaks",
    oracle="""
    WITH active AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events
    ), numbered AS (
        SELECT user_id, d,
               row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
        FROM active
    ), islands AS (
        SELECT user_id, d - rn * INTERVAL '1 day' AS island,
               COUNT(*) AS streak
        FROM numbered GROUP BY user_id, d - rn * INTERVAL '1 day'
    )
    SELECT user_id,
           CAST(SUM(streak) AS BIGINT) AS n_active_days,
           CAST(MAX(streak) AS BIGINT) AS longest_streak
    FROM islands GROUP BY user_id
    """,
)
def q_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest consecutive-day activity streak per user.
    The classic rewrite — distinct active days, a per-user row_number,
    then ``day − rn`` as the island key (constant within any gap-free
    run) — turns a sequential-looking problem into two hash-aggs and one
    partitioned window, no self-join, no iteration.

    Scale: the distinct-day projection collapses the event stream to
    ≤ users × days rows before anything else runs; the window partitions
    by user_id (many small partitions, no global sort). Deterministic:
    (user_id, d) is unique by construction, so the row_number order
    needs no extra tie-break."""
    ev = load_table(spark, sf_dir, "events")
    active = ev.select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    numbered = active.withColumn("rn", F.row_number().over(w))
    islands = numbered.groupBy(
        "user_id", F.date_sub(F.col("d"), F.col("rn")).alias("island")
    ).agg(F.count(F.lit(1)).alias("streak"))
    return islands.groupBy("user_id").agg(
        F.sum("streak").alias("n_active_days"),
        F.max("streak").alias("longest_streak"),
    )


@query(
    "q_recursive_cte",
    oracle="""
    WITH RECURSIVE walk AS (
        SELECT c_custkey AS root, c_custkey AS node, 0 AS depth
        FROM customer WHERE c_custkey < 10
        UNION ALL
        SELECT w.root, c.c_custkey, w.depth + 1
        FROM customer c
        JOIN walk w ON floor(c.c_custkey / 10) = w.node
        WHERE c.c_custkey >= 10
    )
    SELECT root,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MAX(depth) AS INT) AS max_depth
    FROM walk GROUP BY root
    """,
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE) walking the implicit decimal
    forest over customer keys (parent = child div 10, roots < 10):
    per-root descendant count and max depth. This is the SQL front door
    for iterative hierarchy/graph traversal — each recursion step executes
    as a distributed self-join, O(depth) rounds, the same execution shape
    as the tuned DataFrame iteration in operators/dedup.py::
    transitive closure (which remains the path for ops needing
    convergence checks or checkpointing). Acyclic by construction, so
    UNION ALL recursion terminates on both engines."""
    from stockmarketdata_dwb_etl_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE walk AS (
            SELECT c_custkey AS root, c_custkey AS node, 0 AS depth
            FROM customer WHERE c_custkey < 10
            UNION ALL
            SELECT w.root, c.c_custkey AS node, w.depth + 1 AS depth
            FROM customer c
            JOIN walk w ON floor(c.c_custkey / 10) = w.node
            WHERE c.c_custkey >= 10
        )
        SELECT root,
               COUNT(*) AS n_nodes,
               CAST(MAX(depth) AS INT) AS max_depth
        FROM walk GROUP BY root
        """
    )
