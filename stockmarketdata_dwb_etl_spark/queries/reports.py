"""Second report battery + corpus-management operators: TPC-H Q6/Q18, the
deterministic hash split (reproducible train/val/test assignment — the
corpus-management primitive every training-data pipeline needs), an ORC
sink/source roundtrip, and small-file compaction.

These extend the warehouse surface the reference delegates to BigQuery
(/root/reference/dump_bigq.py:135-149 loads the table precisely so analysts
can run shapes like these) with the data-pipeline maintenance operators the
100 TB posture requires (SCALE.md).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockmarketdata_dwb_etl_spark.functions.exact import portable_round
from stockmarketdata_dwb_etl_spark.catalog import load_table
from stockmarketdata_dwb_etl_spark.functions.exact import exact_sum, sql_exact_sum
from stockmarketdata_dwb_etl_spark.registry import query
from stockmarketdata_dwb_etl_spark.scratch import fixture_tag

SCRATCH = "/root/repo/.scratch"


def _tag(sf_dir: str) -> str:
    return fixture_tag(sf_dir)


@query(
    "q_tpch_q6",
    oracle=f"""
    SELECT {sql_exact_sum("l_extendedprice * l_discount", "revenue")},
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24.0
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure scan→filter→agg with no
    join — the query that most directly measures predicate pushdown +
    vectorized scan throughput. All four predicates reach the parquet
    reader as PushedFilters; the aggregate is partial+final with a 1-row
    exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    filtered = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    )
    return filtered.agg(
        exact_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q_tpch_q18",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey,
               {sql_exact_sum("l_quantity", "sum_qty")}
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 250
    )
    SELECT c_name, o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           o_totalprice, sum_qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): aggregate-then-join — the HAVING
    subquery reduces lineitem to the ~1% of orders above the quantity
    threshold BEFORE touching orders/customer, so the expensive join runs
    on the reduced set (at 100 TB this ordering is the difference between
    joining 100 TB and joining 1 TB). Top-100 via TakeOrdered."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(exact_sum(F.col("l_quantity"), "sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


#: hex digit → value lookup string shared by both engines' bucket exprs.
_HEX = "0123456789abcdef"


def hash_bucket(key, n_buckets: int = 256):
    """Deterministic, engine-portable bucket in [0, n_buckets): first two
    hex digits of md5(key-as-string). MD5 is identical everywhere, so the
    SAME row lands in the SAME split on Spark, DuckDB, or any future
    engine — the property that makes train/val/test assignment reproducible
    and join-free (no persisted split table to keep in sync)."""
    assert n_buckets <= 256
    h = F.md5(F.col(key).cast("string"))
    return (
        F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % F.lit(n_buckets)
    )


@query(
    "q_hash_split",
    oracle=f"""
    WITH b AS (
        SELECT *,
               (strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
             + (strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
               AS bucket
        FROM documents
    )
    SELECT CASE WHEN bucket < 230 THEN 'train'
                WHEN bucket < 243 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM b
    GROUP BY 1
    """,
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (~90/5/5) by content-independent
    key hash — the reproducible-split primitive for corpus management. A
    pure map-side projection: no shuffle, no sampling state, no split table
    to join; re-running at any scale or engine assigns every doc
    identically (oracle computes the same md5 buckets in DuckDB)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket("doc_id", 256)
    split = (
        F.when(bucket < 230, "train").when(bucket < 243, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars", "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


@query(
    "q_orc_roundtrip",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           {sql_exact_sum("l_extendedprice", "sum_price")},
           MAX(l_shipdate) AS max_shipdate
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source roundtrip (third columnar format after parquet and
    the text formats): write lineitem as ORC, read back, aggregate — values
    and timestamps must survive bit-exactly. ORC gets the same pushdown/
    pruning treatment as parquet in Spark's vectorized reader."""
    out = os.path.join(SCRATCH, "lineitem_orc", _tag(sf_dir))
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        load_table(spark, sf_dir, "lineitem").write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum(F.col("l_extendedprice"), "sum_price"),
        F.max("l_shipdate").alias("max_shipdate"),
    )


def compact_files(
    spark: SparkSession, src: str, dst: str, target_files: int = 4
) -> None:
    """Small-file compaction: rewrite a directory of many small parquet
    files into `target_files` larger ones. At 100 TB the streaming /
    per-partition writers in this repo produce file counts that degrade
    scan planning (one task per tiny file); periodic compaction restores
    large splits. repartition(n) (round-robin) rather than coalesce(n): a
    full exchange balances output sizes, and the write parallelism stays
    at n regardless of source layout."""
    spark.read.parquet(src).repartition(target_files).write.mode(
        "overwrite"
    ).parquet(dst)


@query(
    "q_compact_small_files",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           {sql_exact_sum("value", "sum_value")}
    FROM events
    GROUP BY event_type
    """,
)
def q_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-maintenance compaction: events written as many small files
    (the pathological layout incremental sinks produce), compacted to 4
    large ones, aggregated from the compacted copy — results must be
    identical to the source table. tests/test_storage.py asserts the file
    count actually dropped."""
    ev = load_table(spark, sf_dir, "events")
    frag = os.path.join(SCRATCH, "events_fragmented", _tag(sf_dir))
    compacted = os.path.join(SCRATCH, "events_compacted", _tag(sf_dir))
    if not os.path.exists(os.path.join(compacted, "_SUCCESS")):
        ev.repartition(64).write.mode("overwrite").parquet(frag)
        compact_files(spark, frag, compacted, target_files=4)
    back = spark.read.parquet(compacted)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum(F.col("value"), "sum_value"),
    )


@query(
    "q_cap_per_group",
    oracle=f"""
    WITH ranked AS (
        SELECT source, doc_id, n_chars,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM ranked
    WHERE rn <= 25
    GROUP BY source
    """,
)
def q_cap_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (domain-mix control): keep at most k docs
    per source, selected by a deterministic pseudo-random order (md5 of the
    key — an unbiased, engine-portable sample, unlike 'first k by id' which
    biases toward old docs). One shuffle on source; the window never sees
    more than one group per partition, and at 100 TB a pre-aggregated
    count + per-group reservoir would replace the full sort (documented
    trade; the cap semantics are identical)."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 25)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


@query(
    "q_tpch_q14",
    oracle=f"""
    WITH j AS (
        SELECT l_extendedprice * (1 - l_discount) AS rev, p_type
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-07-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    ), sums AS (
        SELECT {sql_exact_sum("CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END", "promo_revenue")},
               {sql_exact_sum("rev", "total_revenue")},
               COUNT(*) AS n_items
        FROM j
    )
    SELECT CAST((CAST(floor(CAST((100.0 * promo_revenue / total_revenue) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE)
             AS promo_pct,
           promo_revenue, total_revenue, n_items
    FROM sums
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): conditional aggregation — CASE inside
    the sum splits promo revenue out of one pass over the joined rows; the
    part dim broadcasts, so the only exchange is the 1-row final agg. The
    ratio is computed from the two ROUNDED sums (identical doubles in both
    engines), keeping the division IEEE-deterministic."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-07-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    sums = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            exact_sum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)),
                "promo_revenue",
            ),
            exact_sum(rev, "total_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    return sums.select(
        portable_round(
            100.0 * F.col("promo_revenue") / F.col("total_revenue"), 4
        ).alias("promo_pct"),
        "promo_revenue",
        "total_revenue",
        "n_items",
    )


@query(
    "q_tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_exact_sum("l_extendedprice * (1 - l_discount)", "revenue")},
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): who returned the most revenue
    last quarter — lineitem filtered to returns joins quarter-filtered
    orders, then the customer/nation dims broadcast onto the reduced fact;
    wide group keys (all customer attributes ride the groupBy), top-20 via
    TakeOrdered. Both filters push into their scans."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(exact_sum(rev, "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )
