"""SQL-front-door surface round 3: lateral correlated subqueries,
correlated NOT EXISTS, GROUPING_ID flags, and the array higher-order-
function battery.

These exercise the declarative layer a warehouse user reaches for before
any bespoke operator — the decorrelation, grouping-metadata, and
lambda-expression machinery Catalyst provides natively (and that the
reference delegates wholesale to BigQuery SQL —
/root/reference/dump_bigq.py:135-149).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockmarketdata_dwb_etl_spark.functions.exact import portable_round
from stockmarketdata_dwb_etl_spark.catalog import load_table
from stockmarketdata_dwb_etl_spark.functions.vectors import dot, norm
from stockmarketdata_dwb_etl_spark.registry import query

_DEC = "decimal(38,6)"


@query(
    "q_lateral_topn",
    oracle="""
    SELECT n.n_name, t.c_name,
           CAST((CAST(floor(CAST((t.c_acctbal) AS DOUBLE) * 100.0 + 0.5) AS DOUBLE) / 100.0) AS DOUBLE) AS c_acctbal
    FROM nation n, LATERAL (
        SELECT c_name, c_acctbal FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_name LIMIT 2
    ) t
    ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
    """,
)
def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY … LIMIT: each
    nation joined to its own top-2 customers by balance — the
    for-each-row-run-a-query SQL shape. Catalyst decorrelates the
    correlated limit into a ranked window join (no per-row re-execution),
    so the physical plan is the same shuffle-once top-k-per-group it
    would plan for q_topk_per_group — proof the declarative front door
    does not cost a nested loop. Unique (balance, name) tie-break keeps
    both engines' limits deterministic."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("l_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("l_customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_name,
               CAST((CAST(floor(CAST((t.c_acctbal) AS DOUBLE) * 100.0 + 0.5) AS DOUBLE) / 100.0) AS DOUBLE) AS c_acctbal
        FROM l_nation n, LATERAL (
            SELECT c_name, c_acctbal FROM l_customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_name LIMIT 2
        ) t
        ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
        """
    )


@query(
    "q_exists_correlated",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE c.c_acctbal > 0
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_totalprice > 300000
      )
    ORDER BY c.c_custkey
    """,
)
def q_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS with an extra predicate inside the subquery:
    positive-balance customers who never placed an order over 300k. The
    SQL front door's decorrelation turns this into a left-anti hash join
    on o_custkey with the price predicate PUSHED INTO the orders scan
    (smaller build side than filtering post-join) — the plan a hand-
    written q_join_anti would produce, from declarative text."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("e_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("e_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name
        FROM e_customer c
        WHERE c.c_acctbal > 0
          AND NOT EXISTS (
            SELECT 1 FROM e_orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > 300000
          )
        ORDER BY c.c_custkey
        """
    )


@query(
    "q_grouping_id",
    oracle="""
    SELECT
        CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL'
             ELSE l_returnflag END AS returnflag,
        CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL'
             ELSE l_linestatus END AS linestatus,
        CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
             AS BIGINT) AS gid,
        CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY gid, returnflag, linestatus
    """,
)
def q_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with GROUPING()/grouping-ID metadata: every subtotal row
    carries which dimensions were rolled away (gid = 2·g(flag)+g(status))
    and NULL-vs-'ALL' disambiguation — the flags BI layers need to tell a
    real NULL group from a rollup row. grouping() is evaluated by the
    expand+agg pipeline, exact-decimal sums; CUBE expansion is map-side
    (×4 rows) into one hash-agg shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
        (
            F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")
        )
        .cast("bigint")
        .alias("gid"),
        F.grouping("l_returnflag").alias("__gf"),
        F.grouping("l_linestatus").alias("__gs"),
    )
    return g.select(
        F.when(F.col("__gf") == 1, F.lit("ALL"))
        .otherwise(F.col("l_returnflag"))
        .alias("returnflag"),
        F.when(F.col("__gs") == 1, F.lit("ALL"))
        .otherwise(F.col("l_linestatus"))
        .alias("linestatus"),
        "gid",
        "n_rows",
        "sum_qty",
    ).orderBy("gid", "returnflag", "linestatus")


@query(
    "q_hof_arrays",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           CAST((CAST(floor(CAST((sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                            CAST(embedding AS DOUBLE[])))) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0)
                AS DOUBLE) AS l2_norm,
           CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0))
                AS INTEGER) AS n_positive,
           CAST((CAST(floor(CAST((CAST(list_max(CAST(embedding AS DOUBLE[])) AS DOUBLE)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0)
                AS DOUBLE) AS max_component,
           CAST((CAST(floor(CAST((list_dot_product(
                    CAST(embedding AS DOUBLE[]),
                    list_transform(CAST(embedding AS DOUBLE[]),
                                   x -> CASE WHEN x > 0 THEN 1.0
                                             ELSE 0.0 END))) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0)
                AS DOUBLE) AS sum_positive
    FROM embeddings
    WHERE vec_id < 100
    ORDER BY vec_id
    """,
)
def q_hof_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order-function battery over embedding vectors:
    transform (lambda), filter + size, aggregate-fold (as the proven
    dot-product fold from functions/vectors — the same in-order
    accumulation DuckDB's list_dot_product performs), array_max, and a
    masked sum expressed as dot(v, indicator(v>0)) so BOTH engines fold
    positives in identical array order. All lambdas run inside codegen —
    the JVM lambda path, zero Python. Map-only: no shuffle at any
    scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    mask = F.transform(
        v, lambda x: F.when(x > 0, F.lit(1.0)).otherwise(F.lit(0.0))
    )
    return (
        emb.filter(F.col("vec_id") < 100)
        .select(
            "vec_id",
            F.size(v).cast("int").alias("dim"),
            portable_round(norm(v), 4).cast("double").alias("l2_norm"),
            F.size(F.filter(v, lambda x: x > 0)).cast("int").alias("n_positive"),
            portable_round(F.array_max(v).cast("double"), 4)
            .cast("double")
            .alias("max_component"),
            portable_round(dot(v, mask), 4).cast("double").alias("sum_positive"),
        )
        .orderBy("vec_id")
    )
