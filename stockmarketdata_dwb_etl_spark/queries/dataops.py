"""Training-data pipeline operators: deduplication, text analysis,
similarity search (SURVEY.md §2B "ns" rows; the 100 TB LLM-data surface).

Dedup note (FIXTURES.md): documents has zero exact duplicates by
construction, so exact-dedup queries *inject* duplicates deterministically
(union with a keyed slice) before deduplicating — both engines perform the
identical injection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stockmarketdata_dwb_etl_spark.functions.exact import portable_round
from stockmarketdata_dwb_etl_spark.catalog import load_table
from stockmarketdata_dwb_etl_spark.functions.exact import exact_avg, sql_exact_avg
from stockmarketdata_dwb_etl_spark.functions.vectors import cosine
from stockmarketdata_dwb_etl_spark.registry import query


@query(
    "q_dedup_keys",
    oracle="""
    SELECT user_id, event_type,
           MIN(event_id) AS event_id,
           CAST((CAST(floor(CAST((arg_min(value, event_id)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS value
    FROM events
    GROUP BY user_id, event_type
    """,
)
def q_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping one deterministic full row per (user_id,
    event_type) — row_number()=1 over (event_id) order, the scalable
    keep-first idiom (one shuffle, no collect)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("event_id")
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            portable_round("value", 4).alias("value"),
        )
    )


@query(
    "q_dedup_exact",
    oracle="""
    WITH unioned AS (
        SELECT * FROM documents
        UNION ALL
        SELECT * FROM documents WHERE doc_id % 10 = 0
    )
    SELECT md5(text) AS fp,
           MIN(doc_id) AS doc_id,
           COUNT(*) AS n_copies
    FROM unioned
    GROUP BY md5(text)
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash (hash-groupBy): inject 10% duplicates,
    group on md5(text), keep min doc_id + multiplicity. At 100 TB this is
    the standard first dedup pass — a single hash-agg shuffle on the
    fingerprint, never on the full text."""
    docs = load_table(spark, sf_dir, "documents")
    unioned = docs.unionByName(docs.filter(F.col("doc_id") % 10 == 0))
    return (
        unioned.withColumn("fp", F.md5("text"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@query(
    "q_tokenize_wordcount",
    oracle="""
    WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
    )
    SELECT word, COUNT(*) AS cnt
    FROM words
    WHERE word <> ''
    GROUP BY word
    ORDER BY cnt DESC, word
    LIMIT 50
    """,
)
def q_tokenize_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenize → explode → count → top-50 (tie-broken by word).
    Catalyst plans partial counts before the shuffle; the top-k is
    TakeOrdered, not a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "word")
        .limit(50)
    )


@query(
    "q_text_stats",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           {sql_exact_avg('n_chars', 'avg_chars')},
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           {sql_exact_avg("len(string_split(text, ' '))", 'avg_tokens')}
    FROM documents
    GROUP BY lang
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats incl. token counts — the profiling pass of
    a training-data pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        exact_avg(F.col("n_chars"), "avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        exact_avg(n_tokens, "avg_tokens"),
    )


COSINE_ORACLE = """
    WITH probe AS (
        SELECT CAST(embedding AS DOUBLE[]) AS pv FROM embeddings WHERE vec_id = 0
    ), scored AS (
        SELECT vec_id, label,
               CAST((CAST(floor(CAST((list_dot_product(CAST(embedding AS DOUBLE[]), pv)
                   / nullif(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                  CAST(embedding AS DOUBLE[])))
                          * sqrt(list_dot_product(pv, pv)), 0.0)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS cos_sim
        FROM embeddings, probe
        WHERE vec_id <> 0
    )
    SELECT vec_id, label, cos_sim
    FROM scored
    ORDER BY cos_sim DESC, vec_id
    LIMIT 10
"""


@query("q_cosine_topk", oracle=COSINE_ORACLE)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 vs the probe vector (vec_id=0): broadcast
    the probe, score every row JVM-side (zip_with/aggregate — no UDF), take
    TakeOrdered top-k. The exact-scan baseline an ANN variant is judged
    against; at 100 TB the same plan is one broadcast + one scan."""
    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("pv"))
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            "label",
            portable_round(cosine(F.col("embedding"), F.col("pv")), 4).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.col("cos_sim").desc(), "vec_id").limit(10)


@query(
    "q_knn_pairs",
    oracle="""
    WITH small AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id < 50
    ), pairs AS (
        SELECT a.vec_id AS src, b.vec_id AS nbr,
               CAST((CAST(floor(CAST((list_dot_product(a.v, b.v)
                   / nullif(sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(b.v, b.v)), 0.0)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS cos_sim
        FROM small a JOIN small b ON a.vec_id <> b.vec_id
    )
    SELECT src, nbr, cos_sim FROM (
        SELECT src, nbr, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY cos_sim DESC, nbr) AS rk
        FROM pairs)
    WHERE rk <= 3
    """,
)
def q_knn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-NN by cosine among the first 50 vectors: self cross-join +
    per-source rank. The exact small-scale oracle for ANN evaluation."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    a = emb.select(F.col("vec_id").alias("src"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("nbr"), F.col("embedding").alias("vb"))
    pairs = a.join(F.broadcast(b), F.col("src") != F.col("nbr")).select(
        "src",
        "nbr",
        portable_round(cosine(F.col("va"), F.col("vb")), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("src").orderBy(F.col("cos_sim").desc(), "nbr")
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("src", "nbr", "cos_sim")
    )
