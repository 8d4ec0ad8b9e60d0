"""UDF/UDAF/UDTF query surface (SURVEY.md §2B M5).

q_udf_scalar's oracle is the *same pure-SQL CASE* as q_kmb_parse — the
pandas UDF must agree with both the expression library and DuckDB.
q_udtf_explode uses posexplode as the native stand-in for the one-row→many
UDTF surface (1-based positions to match DuckDB generate_subscripts).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockmarketdata_dwb_etl_spark.catalog import load_table
from stockmarketdata_dwb_etl_spark.functions.udfs import parse_kmb_udf, weighted_avg_udf
from stockmarketdata_dwb_etl_spark.registry import query
from stockmarketdata_dwb_etl_spark.functions.exact import portable_round


@query(
    "q_udf_scalar",
    oracle="""
    WITH raw AS (
        SELECT p_partkey,
               printf('%.2f', (CAST(floor(CAST((p_retailprice / 10) AS DOUBLE) * 100.0 + 0.5) AS DOUBLE) / 100.0))
                 || CASE p_partkey % 4 WHEN 0 THEN 'K' WHEN 1 THEN 'M'
                                       WHEN 2 THEN 'B' ELSE '' END AS vol_str
        FROM part)
    SELECT p_partkey,
           CAST(CAST(floor(CAST(CASE
               WHEN vol_str LIKE '%K' THEN TRY_CAST(substr(vol_str, 1, length(vol_str)-1) AS DOUBLE) * 1e3
               WHEN vol_str LIKE '%M' THEN TRY_CAST(substr(vol_str, 1, length(vol_str)-1) AS DOUBLE) * 1e6
               WHEN vol_str LIKE '%B' THEN TRY_CAST(substr(vol_str, 1, length(vol_str)-1) AS DOUBLE) * 1e9
               ELSE TRY_CAST(replace(vol_str, ',', '') AS DOUBLE)
           END AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0 AS DOUBLE) AS vol
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
        F.format_string("%.2f", portable_round(F.col("p_retailprice") / 10, 2)), suffix
    )
    return part.select(
        "p_partkey",
        portable_round(parse_kmb_udf()(vol_str), 4).alias("vol"),
    )


@query(
    "q_udaf_grouped",
    oracle="""
    SELECT l_returnflag,
           CAST((CAST(floor(CAST((SUM(l_extendedprice * l_quantity) / SUM(l_quantity)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0)
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
        portable_round(weighted_avg_udf()("l_extendedprice", "l_quantity"), 4).alias(
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


@query(
    "q_cogroup_pandas",
    oracle="""
    WITH c AS (
        SELECT user_id, COUNT(*) AS n_clicks FROM events
        WHERE event_type = 'click' GROUP BY user_id
    ), p AS (
        SELECT user_id, COUNT(*) AS n_purch,
               CAST((CAST(floor(CAST((SUM(value)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS purch_value
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           CAST(COALESCE(c.n_clicks, 0) AS BIGINT) AS n_clicks,
           CAST(COALESCE(p.n_purch, 0) AS BIGINT) AS n_purchases,
           COALESCE(p.purch_value, 0.0) AS purch_value
    FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
    """,
)
def q_cogroup_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas COGROUP (`groupBy().cogroup().applyInPandas` —
    FlatMapCoGroupsInPandas): clicks and purchases co-partitioned by user
    and handed to ONE Python function as two aligned pandas frames per
    key — the escape hatch for per-key merge logic no join expresses
    (custom attribution, panel alignment, feature crossing). Here the
    function computes per-user funnel stats, which a full-outer join
    reproduces — the oracle. Both sides shuffle once on user_id; the
    Python boundary is Arrow-batched per cogroup. (4dp float safety:
    2-decimal inputs with ~1e4 sums — a pandas vs DuckDB sum-order ulp
    cannot cross the round.)"""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "value")
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id", "value")

    def funnel(key: tuple, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_clicks": [len(left)],
                "n_purchases": [len(right)],
                "purch_value": [math.floor(float(right["value"].sum()) * 1e4 + 0.5) / 1e4 if len(right) else 0.0],
            }
        )

    return (
        clicks.groupBy("user_id")
        .cogroup(purch.groupBy("user_id"))
        .applyInPandas(
            funnel,
            "user_id bigint, n_clicks bigint, n_purchases bigint, purch_value double",
        )
    )


@query(
    "q_observe_metrics",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_totalprice > 400000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_high,
           CAST((CAST(floor(CAST((CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE)
             AS total_price
    FROM orders
    """,
)
def q_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sidecar pipeline metrics via DataFrame.observe(): data-quality
    counters (row count, high-value count, exact total) accumulate DURING
    a pass over orders — zero extra scans, the production pattern for
    emit-metrics-while-writing (the reference's L4 verification re-reads
    the table instead, sinks.py). The observed values themselves are the
    query output, checked against plain aggregation by the oracle; the
    Observation collect is metrics-sized driver coordination, same class
    as a sketch collect."""
    from pyspark.sql import Observation

    orders = load_table(spark, sf_dir, "orders")
    obs = Observation("orders_metrics")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("o_totalprice") > 400000).cast("long")).alias("n_high"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("total_price"),
    )
    observed.write.format("noop").mode("overwrite").save()  # the real pass
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["n_high"], math.floor(float(m["total_price"]) * 1e4 + 0.5) / 1e4)],
        "n_rows bigint, n_high bigint, total_price double",
    )


@query(
    "q_udaf_window",
    oracle="""
    SELECT event_id, user_id,
           CAST((CAST(floor(CAST((SUM(value * value) OVER w / SUM(value) OVER w) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0)
                AS DOUBLE) AS self_weighted
    FROM events
    WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def q_udaf_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF over a WINDOW frame (not a groupBy): a
    custom value-weighted rolling metric per user across the trailing 5
    purchases — the API surface for rolling statistics no built-in
    aggregate expresses (here self-weighted mean Σv²/Σv, so the oracle
    can recompute it with plain window sums). Arrow ships each frame's
    batch to Python; at 100 TB frames stay per-user-bounded and the
    window is key-partitioned like any native one. (4dp safety: ≤5-term
    sums of 2-decimal values — a summation-order ulp cannot reach the
    round.)"""
    from pyspark.sql.window import Window

    from stockmarketdata_dwb_etl_spark.functions.udfs import self_weighted_udf

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        portable_round(self_weighted_udf()(F.col("value")).over(w), 4).alias("self_weighted"),
    )


@query(
    "q_udf_scalar_iter",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN regexp_extract(text, '\\b[A-Z]{2,}\\b') <> ''
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_with_caps,
           CAST(COUNT(DISTINCT NULLIF(regexp_extract(text, '\\b[A-Z]{2,}\\b'), ''))
                AS BIGINT) AS n_distinct_caps
    FROM documents
    GROUP BY lang
    """,
)
def q_udf_scalar_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form pandas UDF (SCALAR_ITER): per-executor initialization
    (a compiled automaton standing in for model weights) amortized across
    every Arrow batch of a partition — the ML-batch-inference UDF shape,
    complementing the per-batch SCALAR form of q_udf_scalar. Extracts the
    first ALL-CAPS token per document; the aggregate of extractions is
    re-expressed with JVM regexp in the oracle."""
    from stockmarketdata_dwb_etl_spark.functions.udfs import ticker_extract_iter_udf

    docs = load_table(spark, sf_dir, "documents")
    extracted = docs.select(
        "lang", ticker_extract_iter_udf()(F.col("text")).alias("caps")
    )
    return extracted.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("caps").alias("n_with_caps"),
        F.countDistinct("caps").alias("n_distinct_caps"),
    )


@query(
    "q_map_in_arrow",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST(MAX(length(text)) AS INTEGER) AS max_chars
    FROM documents
    GROUP BY lang
    """,
)
def q_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RecordBatch-level Python boundary (``mapInArrow``): the zero-copy
    entry point for columnar Python libraries — the function receives raw
    ``pyarrow.RecordBatch``es (no pandas conversion at all) and computes
    with Arrow compute kernels. Here pc.utf8_length replaces the JVM
    length; downstream aggregation and the oracle verify the kernel
    agrees with the engine byte-for-byte. This is the boundary multimodal
    decoders and polars-style processors use when even the pandas
    conversion of mapInPandas is overhead worth skipping."""
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    def arrow_lengths(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("lang")),
                    pc.cast(
                        pc.utf8_length(
                            batch.column(batch.schema.get_field_index("text"))
                        ),
                        pa.int32(),
                    ),
                ],
                names=["lang", "n_chars_arrow"],
            )

    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    out_schema = StructType(
        [
            StructField("lang", StringType()),
            StructField("n_chars_arrow", IntegerType()),
        ]
    )
    lengths = docs.mapInArrow(arrow_lengths, out_schema)
    return lengths.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars_arrow").cast("bigint").alias("total_chars"),
        F.max("n_chars_arrow").alias("max_chars"),
    )
