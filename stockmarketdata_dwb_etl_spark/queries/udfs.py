"""UDF/UDAF/UDTF query surface (SURVEY.md §2B M5).

q_udf_scalar's oracle is the *same pure-SQL CASE* as q_kmb_parse — the
pandas UDF must agree with both the expression library and DuckDB.
q_udtf_explode uses posexplode as the native stand-in for the one-row→many
UDTF surface (1-based positions to match DuckDB generate_subscripts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockmarketdata_dwb_etl_spark.catalog import load_table
from stockmarketdata_dwb_etl_spark.functions.udfs import parse_kmb_udf, weighted_avg_udf
from stockmarketdata_dwb_etl_spark.registry import query


@query(
    "q_udf_scalar",
    oracle="""
    WITH raw AS (
        SELECT p_partkey,
               printf('%.2f', ROUND(p_retailprice / 10, 2))
                 || CASE p_partkey % 4 WHEN 0 THEN 'K' WHEN 1 THEN 'M'
                                       WHEN 2 THEN 'B' ELSE '' END AS vol_str
        FROM part)
    SELECT p_partkey,
           CAST(ROUND(CASE
               WHEN vol_str LIKE '%K' THEN TRY_CAST(substr(vol_str, 1, length(vol_str)-1) AS DOUBLE) * 1e3
               WHEN vol_str LIKE '%M' THEN TRY_CAST(substr(vol_str, 1, length(vol_str)-1) AS DOUBLE) * 1e6
               WHEN vol_str LIKE '%B' THEN TRY_CAST(substr(vol_str, 1, length(vol_str)-1) AS DOUBLE) * 1e9
               ELSE TRY_CAST(replace(vol_str, ',', '') AS DOUBLE)
           END, 4) AS DOUBLE) AS vol
    FROM raw
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K/M/B parse as an Arrow-batched pandas UDF; oracle = the pure-SQL
    CASE (and therefore also differential vs the q_kmb_parse expression)."""
    part = load_table(spark, sf_dir, "part")
    suffix = (
        F.when(F.col("p_partkey") % 4 == 0, "K")
        .when(F.col("p_partkey") % 4 == 1, "M")
        .when(F.col("p_partkey") % 4 == 2, "B")
        .otherwise("")
    )
    vol_str = F.concat(
        F.format_string("%.2f", F.round(F.col("p_retailprice") / 10, 2)), suffix
    )
    return part.select(
        "p_partkey",
        F.round(parse_kmb_udf()(vol_str), 4).alias("vol"),
    )


@query(
    "q_udaf_grouped",
    oracle="""
    SELECT l_returnflag,
           CAST(ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4)
                AS DOUBLE) AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per return flag via a grouped-agg
    pandas UDF (Arrow transfer, one batch per group)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(weighted_avg_udf()("l_extendedprice", "l_quantity"), 4).alias(
            "wavg_price"
        )
    )


@query(
    "q_udtf_explode",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, ' '), 1) AS INTEGER) AS pos,
           unnest(string_split(text, ' ')) AS word
    FROM documents
    WHERE doc_id < 100
    """,
)
def q_udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row→many expansion: split text to (pos, word) rows — the UDTF
    surface expressed with the native posexplode generator."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "word"),
    ).select("doc_id", (F.col("pos") + 1).cast("int").alias("pos"), "word")


@query(
    "q_udtf_python",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, ' '), 1) AS INTEGER) AS pos,
           unnest(string_split(text, ' ')) AS word
    FROM documents
    WHERE doc_id < 100
    """,
)
def q_udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Python UDTF (PySpark 4 `udtf`) lateral-joined per input row —
    the genuine user-defined table function machinery, same semantics (and
    same oracle) as the native posexplode form in q_udtf_explode. Arrow
    batch exchange; generators like this are the surface for custom row
    expanders the built-ins can't express."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, word string", useArrow=True)
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" ")):
                yield i + 1, w

    spark.udtf.register("split_words", SplitWords)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    docs.createOrReplaceTempView("__docs_for_udtf")
    return spark.sql(
        "SELECT doc_id, pos, word FROM __docs_for_udtf, LATERAL split_words(text)"
    )
