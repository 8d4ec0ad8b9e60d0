"""Core relational surface: scan/project/filter/sort/limit/set ops.

These generalize the reference's row-level pipeline operators
(/root/reference/main.py:98-106 projection+trim, :102 malformed-row filter,
:104 constant source tag; /root/reference/dump_bigq.py:114-122 column-rename
normalization) onto Catalyst-planned scans. All are pure built-in DataFrame
ops: predicate pushdown, column pruning and TakeOrdered come free.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stockmarketdata_dwb_etl_spark.catalog import load_table
from stockmarketdata_dwb_etl_spark.registry import query


@query(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, trim(l_returnflag) AS returnflag,
           l_quantity AS qty, l_extendedprice AS price
    FROM lineitem
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + column-pruned projection with trim (ref main.py:98-103)."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.trim("l_returnflag").alias("returnflag"),
        F.col("l_quantity").alias("qty"),
        F.col("l_extendedprice").alias("price"),
    )


@query(
    "q_filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_discount, l_tax
    FROM lineitem
    WHERE (l_quantity > 30 AND l_returnflag = 'R')
       OR (l_discount >= 0.09 AND l_tax < 0.02)
    """,
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive/disjunctive predicates, pushed into the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        ((F.col("l_quantity") > 30) & (F.col("l_returnflag") == "R"))
        | ((F.col("l_discount") >= 0.09) & (F.col("l_tax") < 0.02))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_discount", "l_tax")


@query(
    "q_drop_malformed",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
    FROM lineitem
    WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
      AND l_returnflag IS NOT NULL
    """,
)
def q_drop_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validity filter — the engine analog of the reference's arity check
    (ref main.py:102: drop rows where cell count != header count)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"
    )
    return li.na.drop(subset=["l_quantity", "l_extendedprice", "l_returnflag"])


@query(
    "q_lit_tag",
    oracle="""
    SELECT o_orderkey, o_totalprice, 'status_F' AS src FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, o_totalprice, 'status_O' AS src FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q_lit_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant source-tag column + union of tagged scans (ref main.py:104:
    ``data['stock_name'] = stock_name`` is the reference's only join-key
    creator; here as withColumn(lit) + unionByName)."""
    orders = load_table(spark, sf_dir, "orders")
    tag_f = (
        orders.filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice")
        .withColumn("src", F.lit("status_F"))
    )
    tag_o = (
        orders.filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_totalprice")
        .withColumn("src", F.lit("status_O"))
    )
    return tag_f.unionByName(tag_o)


VOL_CANDIDATES = ("Vol", "Vol.", "Volume", "VOL")


def rename_first_match(df: DataFrame, candidates, target: str) -> DataFrame:
    """First-match-wins column rename (ref dump_bigq.py:114-118: the first
    of ['Vol','Vol.','Volume','VOL'] present becomes 'Vol')."""
    for cand in candidates:
        if cand in df.columns:
            return df.withColumnRenamed(cand, target)
    return df


@query(
    "q_rename_normalize",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity AS "Vol"
    FROM lineitem
    """,
)
def q_rename_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simulate a scrape that produced a 'Vol.'-named column, then apply the
    reference's candidate-list normalization (dump_bigq.py:114-118)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.col("l_quantity").alias("Vol.")
    )
    return rename_first_match(li, VOL_CANDIDATES, "Vol")


@query(
    "q_orderby_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 with unique tie-break → planner emits TakeOrdered
    (per-partition top-k + merge; no global sort materialization)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "q_union_all",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 250000
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_totalprice")
    b = orders.filter(F.col("o_totalprice") > 250000).select("o_orderkey", "o_totalprice")
    return a.unionByName(b)


@query(
    "q_union_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.union(b).distinct()


@query(
    "q_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b)


@query(
    "q_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (EXCEPT DISTINCT): customers with a finished order but
    no pending one — non-empty at every fixture scale."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return a.subtract(b)


@query(
    "q_distinct_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_quantity FROM lineitem
    """,
)
def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT — hash-aggregate dedup, partial+final (map-side
    combine) by construction; the WRITE_TRUNCATE-idempotence analog."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .dropDuplicates()
    )


@query(
    "q_cross_join",
    oracle="""
    SELECT r1.r_name AS name_a, r2.r_name AS name_b
    FROM region r1 CROSS JOIN region r2
    """,
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    r1 = region.select(F.col("r_name").alias("name_a"))
    r2 = region.select(F.col("r_name").alias("name_b"))
    return r1.crossJoin(r2)


@query(
    "q_csv_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
    """,
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + source round-trip with explicit schema (ref S10/S11:
    main.py:123-133 DictWriter sink, dump_bigq.py:91 read_csv source).

    Distributed write (one file per partition) and schema-enforced read —
    the engine-side equivalent of the reference's CSV checkpoint handoff
    (Dockerfile:26-36). Scratch dir lives inside the repo to respect the
    sandbox; on a cluster this is an object-store path.

    The oracle is the pre-roundtrip projection: a lossless sink+source must
    hash identically to the original rows (Java double formatting is
    round-trippable, so o_totalprice survives CSV exactly).
    """
    out = tempfile.mkdtemp(prefix="csv_roundtrip_", dir="/root/repo/.scratch")
    subset = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(out, "orders_csv")
    subset.write.mode("overwrite").option("header", True).csv(path)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    return spark.read.option("header", True).schema(schema).csv(path)


@query(
    "q_intersect_all",
    oracle="""
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (INTERSECT ALL): each supplier key appears
    min(count_left, count_right) times — bag semantics the DISTINCT form
    (q_intersect) destroys; needed when multiplicity IS the signal
    (per-occurrence reconciliation). Catalyst plans a count-aggregated
    join, not a row-pairing loop."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    b = li.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    return a.intersectAll(b)


@query(
    "q_except_all",
    oracle="""
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL): occurrences subtract — key kept
    max(count_left − count_right, 0) times, the reconciliation semantics
    for 'what remains after matching one-for-one' (vs q_except's
    membership test)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    b = li.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    return a.exceptAll(b)
