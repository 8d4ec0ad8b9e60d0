"""Scalar/expression query surface: the reference's parsing semantics
(K/M/B, percent, comma-numeric, "MMM d, yyyy" dates — dump_bigq.py:70-128)
plus the general date/string/math/conditional/JSON/array function surface
the OHLCV warehouse implies.

String fixtures are DERIVED inside each query from numeric fixture columns
(FIXTURES.md §B note): both Spark and the DuckDB oracle construct identical
strings deterministically, then parse them back — no extra files, and the
round-trip exercises both directions.

Determinism notes baked into the constructions:
- doubles are pre-rounded before ``%.2f`` formatting so Java (HALF_UP) and C
  (half-even) formatters cannot disagree on a tie;
- integer→string casts are dialect-identical; double→string casts are never
  used.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockmarketdata_dwb_etl_spark.functions.exact import portable_round
from stockmarketdata_dwb_etl_spark.catalog import load_table
from stockmarketdata_dwb_etl_spark.functions.parsing import (
    parse_kmb,
    parse_mdy_date,
    parse_money,
    parse_pct,
)
from stockmarketdata_dwb_etl_spark.registry import query


@query(
    "q_kmb_parse",
    oracle="""
    WITH raw AS (
        SELECT p_partkey,
               printf('%.2f', (CAST(floor(CAST((p_retailprice / 10) AS DOUBLE) * 100.0 + 0.5) AS DOUBLE) / 100.0))
                 || CASE p_partkey % 4 WHEN 0 THEN 'K' WHEN 1 THEN 'M'
                                       WHEN 2 THEN 'B' ELSE '' END AS vol_str
        FROM part)
    SELECT p_partkey, vol_str,
           CAST((CAST(floor(CAST((CASE
               WHEN vol_str LIKE '%K' THEN TRY_CAST(substr(vol_str, 1, length(vol_str)-1) AS DOUBLE) * 1e3
               WHEN vol_str LIKE '%M' THEN TRY_CAST(substr(vol_str, 1, length(vol_str)-1) AS DOUBLE) * 1e6
               WHEN vol_str LIKE '%B' THEN TRY_CAST(substr(vol_str, 1, length(vol_str)-1) AS DOUBLE) * 1e9
               ELSE TRY_CAST(replace(vol_str, ',', '') AS DOUBLE)
           END) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS vol
    FROM raw
    """,
)
def q_kmb_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the reference's K/M/B volume format (dump_bigq.py:70-86):
    format p_retailprice into suffixed strings, parse back with the engine's
    parse_kmb expression."""
    part = load_table(spark, sf_dir, "part")
    suffix = (
        F.when(F.col("p_partkey") % 4 == 0, "K")
        .when(F.col("p_partkey") % 4 == 1, "M")
        .when(F.col("p_partkey") % 4 == 2, "B")
        .otherwise("")
    )
    vol_str = F.concat(
        F.format_string("%.2f", portable_round(F.col("p_retailprice") / 10, 2)), suffix
    )
    return part.select(
        "p_partkey",
        vol_str.alias("vol_str"),
        portable_round(parse_kmb(vol_str), 4).alias("vol"),
    )


@query(
    "q_pct_parse",
    oracle="""
    WITH raw AS (
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_partkey % 2 = 0 THEN '+' ELSE '-' END
                 || printf('%.2f', (CAST(floor(CAST((l_discount * 100) AS DOUBLE) * 100.0 + 0.5) AS DOUBLE) / 100.0)) || '%' AS chg_str
        FROM lineitem)
    SELECT l_orderkey, l_linenumber, chg_str,
           TRY_CAST(regexp_replace(chg_str, '%$', '') AS DOUBLE) AS chg
    FROM raw
    """,
)
def q_pct_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the reference's signed-percent format (dump_bigq.py:124-128,
    '+0.52%' → 0.52 with sign kept)."""
    li = load_table(spark, sf_dir, "lineitem")
    chg_str = F.concat(
        F.when(F.col("l_partkey") % 2 == 0, F.lit("+")).otherwise(F.lit("-")),
        F.format_string("%.2f", portable_round(F.col("l_discount") * 100, 2)),
        F.lit("%"),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        chg_str.alias("chg_str"),
        parse_pct(chg_str).alias("chg"),
    )


@query(
    "q_cast_comma_numeric",
    oracle="""
    WITH raw AS (
        SELECT p_partkey,
               CASE WHEN CAST(floor((CAST(floor(CAST((p_retailprice) AS DOUBLE) * 100.0 + 0.5) AS DOUBLE) / 100.0)) AS BIGINT) >= 1000
                    THEN CAST(CAST(floor((CAST(floor(CAST((p_retailprice) AS DOUBLE) * 100.0 + 0.5) AS DOUBLE) / 100.0)) AS BIGINT) // 1000 AS VARCHAR)
                         || ',' || lpad(CAST(CAST(floor((CAST(floor(CAST((p_retailprice) AS DOUBLE) * 100.0 + 0.5) AS DOUBLE) / 100.0)) AS BIGINT) % 1000 AS VARCHAR), 3, '0')
                    ELSE CAST(CAST(floor((CAST(floor(CAST((p_retailprice) AS DOUBLE) * 100.0 + 0.5) AS DOUBLE) / 100.0)) AS BIGINT) AS VARCHAR)
               END || substr(printf('%.2f', (CAST(floor(CAST((p_retailprice) AS DOUBLE) * 100.0 + 0.5) AS DOUBLE) / 100.0) - floor((CAST(floor(CAST((p_retailprice) AS DOUBLE) * 100.0 + 0.5) AS DOUBLE) / 100.0))), 2) AS price_str
        FROM part)
    SELECT p_partkey, price_str,
           CAST((CAST(floor(CAST((TRY_CAST(replace(price_str, ',', '') AS DOUBLE)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS price
    FROM raw
    """,
)
def q_cast_comma_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the reference's comma-thousands money format
    ('42,801.72' → 42801.72, dump_bigq.py:102-111): build the comma string
    deterministically from p_retailprice, strip commas, cast back."""
    part = load_table(spark, sf_dir, "part")
    x2 = portable_round(F.col("p_retailprice"), 2)
    int_part = F.floor(x2).cast("bigint")
    grouped = F.when(
        int_part >= 1000,
        F.concat(
            (int_part / 1000).cast("bigint").cast("string"),
            F.lit(","),
            F.lpad((int_part % 1000).cast("string"), 3, "0"),
        ),
    ).otherwise(int_part.cast("string"))
    frac = F.substring(F.format_string("%.2f", x2 - F.floor(x2)), 2, 10)
    price_str = F.concat(grouped, frac)
    return part.select(
        "p_partkey",
        price_str.alias("price_str"),
        portable_round(parse_money(price_str), 4).alias("price"),
    )


@query(
    "q_date_parse",
    oracle="""
    WITH raw AS (
        SELECT o_orderkey, strftime(o_orderdate, '%b %-d, %Y') AS date_str
        FROM orders)
    SELECT o_orderkey, date_str,
           CAST(strptime(date_str, '%b %d, %Y') AS DATE) AS parsed_date
    FROM raw
    """,
)
def q_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the reference's date format ('Mar 7, 2025', MMM d yyyy —
    dump_bigq.py:97-99): format o_orderdate, parse back to DATE."""
    orders = load_table(spark, sf_dir, "orders")
    date_str = F.date_format("o_orderdate", "MMM d, yyyy")
    return orders.select(
        "o_orderkey",
        date_str.alias("date_str"),
        parse_mdy_date(date_str).alias("parsed_date"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(dayofmonth(o_orderdate) AS INTEGER) AS dom,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INTEGER) AS days_to_y2k,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS plus_30d
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part/trunc/diff/add surface over the timestamp-typed o_orderdate."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.dayofmonth("o_orderdate").cast("int").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).cast("int").alias("days_to_y2k"),
        (d + F.expr("INTERVAL 30 DAYS")).cast("timestamp").alias("plus_30d"),
    )


@query(
    "q_string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS seg_lower,
           substr(c_name, 1, 8) AS name_prefix,
           c_name || '/' || c_mktsegment AS name_seg,
           CAST(length(c_name) AS INTEGER) AS name_len,
           regexp_extract(c_name, '([0-9]+)', 1) AS cust_num,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           replace(c_name, 'Customer', 'Cust') AS name_short
    FROM customer
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("/", "c_name", "c_mktsegment").alias("name_seg"),
        F.length("c_name").cast("int").alias("name_len"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("cust_num"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("name_short"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST((CAST(floor(CAST((l_extendedprice) AS DOUBLE) * 10.0 + 0.5) AS DOUBLE) / 10.0) AS DOUBLE) AS price_r1,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           CAST((CAST(floor(CAST((ln(l_extendedprice)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS price_ln,
           CAST((CAST(floor(CAST((power(l_quantity, 2)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS qty_sq,
           CAST((CAST(floor(CAST((sqrt(l_extendedprice)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS price_sqrt,
           CAST(sign(l_discount - 0.05) AS INTEGER) AS disc_sign,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod
    FROM lineitem
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        portable_round("l_extendedprice", 1).cast("double").alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        portable_round(F.log("l_extendedprice"), 4).cast("double").alias("price_ln"),
        portable_round(F.pow("l_quantity", F.lit(2)), 4).cast("double").alias("qty_sq"),
        portable_round(F.sqrt("l_extendedprice"), 4).cast("double").alias("price_sqrt"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod"),
    )


@query(
    "q_case_null",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 25 THEN 'mid'
                ELSE 'high' END AS qty_bucket,
           nullif(l_returnflag, 'N') AS flag_or_null,
           coalesce(nullif(l_returnflag, 'N'), 'kept') AS flag_kept,
           CASE WHEN l_discount > 0.05 THEN l_extendedprice * (1 - l_discount) END AS maybe_disc
    FROM lineitem
    """,
)
def q_case_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE ladder + nullif/coalesce — the reference's bad→NULL policy
    (dump_bigq.py:71-72) generalized to conditional expressions."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 25, "mid")
        .otherwise("high")
        .alias("qty_bucket"),
        F.nullif(F.col("l_returnflag"), F.lit("N")).alias("flag_or_null"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("kept")).alias(
            "flag_kept"
        ),
        F.when(
            F.col("l_discount") > 0.05,
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
        ).alias("maybe_disc"),
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    WHERE TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-VARCHAR extraction (events.props like '{"k": 87}') with a
    pushable filter on the extracted value."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int")
    return ev.select("event_id", k.alias("k")).filter(F.col("k") > 50)


@query(
    "q_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           CAST((CAST(floor(CAST((embedding[1]) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS first_val,
           CAST((CAST(floor(CAST((embedding[64]) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS last_val,
           CAST((CAST(floor(CAST((list_sum(embedding[1:4])) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS head_sum
    FROM embeddings
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ArrayType surface over the 64-dim embedding column: size/element_at/
    slice/aggregate — JVM-side higher-order functions, no UDF."""
    emb = load_table(spark, sf_dir, "embeddings")
    head = F.slice("embedding", 1, 4)
    head_sum = F.aggregate(
        head, F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    return emb.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        portable_round(F.element_at("embedding", 1).cast("double"), 4).alias("first_val"),
        portable_round(F.element_at("embedding", 64).cast("double"), 4).alias("last_val"),
        portable_round(head_sum, 4).alias("head_sum"),
    )


@query(
    "q_variant_json",
    oracle="""
    WITH k AS (
        SELECT CAST(props->>'k' AS INTEGER) AS k
        FROM events WHERE props IS NOT NULL
    )
    SELECT 't' || CAST(k % 4 AS VARCHAR) AS tag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(COUNT(DISTINCT 'b' || CAST(k % 3 AS VARCHAR)) AS BIGINT)
               AS n_buckets
    FROM k WHERE k IS NOT NULL
    GROUP BY 1
    """,
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT surface (Spark 4): nested JSON documents
    are parsed ONCE into the binary VARIANT encoding with ``parse_json``,
    then fields come out via ``variant_get`` path expressions — object
    traversal (``$.meta.k``), array indexing (``$.tags[0]``) — with
    per-extraction type casts. This is the open-ended-schema path the
    fixed-schema promotion pipeline (ref dump_bigq.py:88-132) cannot
    express: ingest keeps every attribute, queries bind types lazily.

    Nested documents are synthesized deterministically from events.props
    so the oracle can recompute every extracted field arithmetically —
    any parse/traversal divergence fails the hash gate. Scale: VARIANT
    parse + path extraction are JVM columnar expressions (no UDF, no
    re-parse per path — shredded access on the binary encoding); the
    aggregate is an ordinary partial-agg shuffle on a 4-value key."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    doc = F.format_string(
        '{"meta":{"k":%d,"bucket":"b%d"},"tags":["t%d","x"]}',
        k, k % 3, k % 4,
    )
    parsed = (
        ev.filter(F.col("props").isNotNull())
        .select(k.alias("k_raw"), doc.alias("doc"))
        .filter(F.col("k_raw").isNotNull())
        .select(F.parse_json(F.col("doc")).alias("v"))
    )
    fields = parsed.select(
        F.variant_get(F.col("v"), "$.meta.k", "int").alias("k"),
        F.variant_get(F.col("v"), "$.meta.bucket", "string").alias("bucket"),
        F.variant_get(F.col("v"), "$.tags[0]", "string").alias("tag"),
    )
    return fields.groupBy("tag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.countDistinct("bucket").alias("n_buckets"),
    )
