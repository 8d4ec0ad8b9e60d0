"""Corpus-curation operators round 2: the daily jobs of a production
LLM-pretraining data pipeline that go beyond per-document scoring —
benchmark-contamination detection, sequence packing, repetition scoring,
PII scrubbing, and incremental (seen-set) dedup.

Generalizes the reference's clean-then-load stage
(``/root/reference/dump_bigq.py:88-132`` — fixed row-level transforms
before a warehouse write) to the transforms a 100 TB text corpus needs
before a training run. Every query carries a full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockmarketdata_dwb_etl_spark.functions.exact import (
    fold_term_sum,
    portable_round,
    sql_portable_round,
    sql_term_sum,
)
from stockmarketdata_dwb_etl_spark.catalog import load_table
from stockmarketdata_dwb_etl_spark.functions.text import tokenize, word_shingles
from stockmarketdata_dwb_etl_spark.registry import QUERIES, query

# Deterministic stand-in for a benchmark/eval holdout: every 17th doc.
# Contamination and seen-set checks run the corpus against this slice.
_BENCH_PRED = "doc_id % 17 = 0"

_DUCK_TOKENS = "list_filter(string_split(text, ' '), x -> x <> '')"


@query(
    "q_contamination",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(w) - 7, 0)),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                        w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' ||
                        w[i+6] || ' ' || w[i+7])) AS shingles
        FROM tok
    ), bench AS (
        SELECT DISTINCT unnest(shingles) AS sh FROM sh WHERE {_BENCH_PRED}
    ), corpus AS (
        SELECT doc_id, unnest(shingles) AS sh FROM sh WHERE NOT ({_BENCH_PRED})
    )
    SELECT c.doc_id,
           CAST(COUNT(b.sh) AS BIGINT) AS n_shared_8grams,
           COUNT(b.sh) > 0 AS contaminated
    FROM corpus c LEFT JOIN bench b ON c.sh = b.sh
    GROUP BY c.doc_id
    """,
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: flag corpus documents sharing any
    8-gram with the eval holdout — the pre-training hygiene check that keeps
    test sets out of the training mix. Both sides shuffle on the 8-gram
    string only (never full text); the holdout side is DISTINCT-reduced
    before the join and would be broadcast at any realistic benchmark size
    (benchmarks are MBs; the corpus is the 100 TB side)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode_outer(
            F.array_distinct(word_shingles(tokenize(F.col("text")), 8))
        ).alias("sh"),
    )
    bench = (
        sh.filter(F.col("doc_id") % 17 == 0).select("sh").distinct()
        .withColumn("__hit", F.lit(1))
    )
    corpus = sh.filter(F.col("doc_id") % 17 != 0)
    return (
        corpus.join(F.broadcast(bench), "sh", "left")
        .groupBy("doc_id")
        .agg(F.count("__hit").alias("n_shared_8grams"))
        .select(
            "doc_id",
            "n_shared_8grams",
            (F.col("n_shared_8grams") > 0).alias("contaminated"),
        )
    )


@query(
    "q_pack_sequences",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, CAST(len({_DUCK_TOKENS}) AS BIGINT) AS n_tokens
        FROM documents
    ), pre AS (
        SELECT doc_id, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS token_offset
        FROM tok
    )
    SELECT doc_id, n_tokens, token_offset,
           token_offset // 512 AS seq_id,
           token_offset % 512 AS seq_offset
    FROM pre
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate the corpus in doc_id order and cut
    fixed 512-token training sequences — each document gets its global
    token offset (exclusive prefix sum) and the sequence/offset it starts
    in. The prefix sum runs through operators/rank.py::global_prefix_sum
    (range shuffle + per-partition offsets, one broadcast of P rows), NOT
    a global unpartitioned window — the difference between a map pass and
    a single-reducer sort at 100 TB."""
    from stockmarketdata_dwb_etl_spark.operators.rank import global_prefix_sum

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokenize(F.col("text"))).cast("bigint").alias("n_tokens")
    )
    packed = global_prefix_sum(
        docs, "n_tokens", ["doc_id"], out="token_offset"
    )
    return packed.select(
        "doc_id",
        "n_tokens",
        "token_offset",
        (F.col("token_offset") / 512).cast("bigint").alias("seq_id"),
        (F.col("token_offset") % 512).alias("seq_offset"),
    )


@query(
    "q_repetition_score",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents
    ), sh AS (
        SELECT doc_id,
               list_transform(
                   generate_series(1, greatest(len(w) - 2, 0)),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS g
        FROM tok
    )
    SELECT doc_id,
           CAST(len(g) AS BIGINT) AS n_3grams,
           CAST(len(list_distinct(g)) AS BIGINT) AS n_distinct_3grams,
           CAST((CAST(floor(CAST((CASE WHEN len(g) = 0 THEN 1.0
                ELSE len(list_distinct(g))::DOUBLE / len(g) END) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE)
               AS distinct_ratio,
           (CASE WHEN len(g) = 0 THEN 1.0
                 ELSE len(list_distinct(g))::DOUBLE / len(g) END) < 0.6
               AS repetitive
    FROM sh
    """,
)
def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition scoring: distinct-3gram ratio per document — the
    boilerplate/loop detector every pretraining quality filter runs (a
    low ratio means the document repeats itself). Pure JVM higher-order
    functions on the tokenized array; no explode, no shuffle — a map-only
    pass over the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    g = word_shingles(tokenize(F.col("text")), 3)
    n = F.size(g).cast("bigint")
    nd = F.size(F.array_distinct(g)).cast("bigint")
    ratio = F.when(n == 0, F.lit(1.0)).otherwise(nd.cast("double") / n)
    return docs.select(
        "doc_id",
        n.alias("n_3grams"),
        nd.alias("n_distinct_3grams"),
        portable_round(ratio, 4).alias("distinct_ratio"),
        (ratio < 0.6).alias("repetitive"),
    )


@query(
    "q_pii_scrub",
    oracle="""
    WITH aug AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0
                    THEN text || ' contact user' || doc_id ||
                         '@example.com or 555-0' || (100 + doc_id % 900) || '-' ||
                         (1000 + doc_id % 9000)
                    ELSE text END AS text
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INTEGER)
               AS n_emails,
           CAST(len(regexp_extract_all(text,
                '\\d{3}-\\d{4,6}-\\d{4}')) AS INTEGER) AS n_phones,
           md5(regexp_replace(regexp_replace(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                '\\d{3}-\\d{4,6}-\\d{4}', '<PHONE>', 'g')) AS scrubbed_md5
    FROM aug
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: redact email addresses and phone-shaped numbers with
    typed placeholder tokens, counting redactions per document — the
    compliance transform that runs over every byte of a training corpus.
    PII is injected deterministically (every 7th doc) since the synthetic
    corpus ships none; patterns kept to the RE2 ∩ Java-regex common subset
    so both engines see identical matches. Map-only: regexp_replace is a
    JVM expression, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"\d{3}-\d{4,6}-\d{4}"
    aug = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or 555-0"),
                (F.lit(100) + F.col("doc_id") % 900).cast("string"),
                F.lit("-"),
                (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), email_re, "<EMAIL>"),
        phone_re,
        "<PHONE>",
    )
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(email_re), 0)).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(phone_re), 0)).alias(
            "n_phones"
        ),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


@query(
    "q_dedup_incremental",
    oracle=f"""
    WITH seen AS (
        SELECT DISTINCT md5(text) AS fp FROM documents WHERE {_BENCH_PRED}
    )
    SELECT d.doc_id, d.source, md5(d.text) AS fingerprint
    FROM documents d LEFT JOIN seen s ON md5(d.text) = s.fp
    WHERE NOT ({_BENCH_PRED}) AND s.fp IS NULL
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (seen-set) dedup: drop every new document whose content
    fingerprint already exists in the previously-ingested corpus — the
    daily-ingest shape of exact dedup (the reference's @daily refresh
    recomputes the world; a 100 TB pipeline anti-joins the day's arrivals
    against the historical fingerprint table instead). Left-anti join on
    the md5 fingerprint only — text never shuffles, and the seen-set side
    would be the small broadcast side on any real day."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", "source", F.md5("text").alias("fingerprint")
    )
    seen = (
        fp.filter(F.col("doc_id") % 17 == 0)
        .select(F.col("fingerprint").alias("fp"))
        .distinct()
    )
    return (
        fp.filter(F.col("doc_id") % 17 != 0)
        .join(
            F.broadcast(seen),
            fp.fingerprint == F.col("fp"),
            "left_anti",
        )
    )


@query(
    "q_dq_expectations",
    oracle="""
    SELECT 'orders_pk_unique' AS rule_name,
           CAST((SELECT COUNT(*) FROM
                 (SELECT o_orderkey FROM orders GROUP BY o_orderkey
                  HAVING COUNT(*) > 1)) AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'orders_totalprice_positive',
           CAST((SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0
                 OR o_totalprice IS NULL) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_quantity_range',
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_quantity < 1 OR l_quantity > 50
                 OR l_quantity IS NULL) AS BIGINT)
    UNION ALL
    SELECT 'orders_custkey_fk',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    """,
)
def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation battery (the dbt-test / Great-Expectations
    surface): primary-key uniqueness, value-range checks, and referential
    integrity, each reported as (rule, violation count). Uniqueness is a
    keys-only hash aggregate; the FK check is a left-anti join that
    broadcasts the dimension's key column — at 100 TB each rule is one
    scan-shaped pass and the whole battery unions lazily so Spark
    schedules the scans together."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")

    def rule(name: str, count_df: DataFrame) -> DataFrame:
        return count_df.select(
            F.lit(name).alias("rule_name"),
            F.col("n").cast("bigint").alias("n_violations"),
        )

    pk = rule(
        "orders_pk_unique",
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("n")),
    )
    price = rule(
        "orders_totalprice_positive",
        orders.filter(
            (F.col("o_totalprice") <= 0) | F.col("o_totalprice").isNull()
        ).agg(F.count(F.lit(1)).alias("n")),
    )
    qty = rule(
        "lineitem_quantity_range",
        lineitem.filter(
            (F.col("l_quantity") < 1)
            | (F.col("l_quantity") > 50)
            | F.col("l_quantity").isNull()
        ).agg(F.count(F.lit(1)).alias("n")),
    )
    fk = rule(
        "orders_custkey_fk",
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            orders.o_custkey == F.col("c_custkey"),
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("n")),
    )
    return pk.unionByName(price).unionByName(qty).unionByName(fk)


@query(
    "q_tfidf_topterms",
    oracle="""
    WITH terms AS (
        SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
              FROM documents)
        WHERE word <> ''
        GROUP BY doc_id, word
    ), df AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM terms GROUP BY word
    ), n AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents
    ), ranked AS (
        SELECT t.doc_id, t.word, t.tf, d.df,
               CAST((CAST(floor(CAST((t.tf * ln(n.n_docs / d.df)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS tfidf,
               ROW_NUMBER() OVER (PARTITION BY t.doc_id
                   ORDER BY t.tf DESC, d.df ASC, t.word) AS rk
        FROM terms t JOIN df d ON t.word = d.word CROSS JOIN n
    )
    SELECT doc_id, word, tf, df, tfidf FROM ranked WHERE rk <= 3
    """,
)
def q_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document — the classic relevance/keyword
    extraction pass. Ranking is fully INTEGER-deterministic (tf desc, df
    asc, term) so cross-engine ln() ulp differences can never flip the
    selected rows; the float tfidf score is output-only. Plan: one
    (doc, term) hash aggregate, a vocabulary aggregate broadcast back
    (vocabularies are millions of rows — broadcastable — while the corpus
    is the 100 TB side), and a per-doc top-k window."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    terms = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = terms.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), "word"
    )
    return (
        terms.join(F.broadcast(df), "word")
        .join(F.broadcast(n_docs))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "doc_id",
            "word",
            "tf",
            "df",
            portable_round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4
            ).alias("tfidf"),
        )
    )


@query(
    "q_url_extract",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               CASE doc_id % 7
                    WHEN 0 THEN 'en.wikipedia.org'
                    WHEN 1 THEN 'github.com'
                    WHEN 2 THEN 'arxiv.org'
                    WHEN 3 THEN 'news.ycombinator.com'
                    WHEN 4 THEN 'docs.python.org'
                    WHEN 5 THEN 'www.example.com'
                    ELSE 'blog.example.co.uk' END AS host,
               CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END AS scheme,
               doc_id % 4 AS path_depth
        FROM documents
    )
    SELECT host,
           regexp_extract(host, '[^.]+$') AS tld,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE scheme = 'https') AS BIGINT) AS n_https,
           CAST((CAST(floor(CAST((AVG(path_depth)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS avg_path_depth,
           CAST(0 AS BIGINT) AS n_bad_qid
    FROM u
    GROUP BY host
    """,
)
def q_url_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing and per-domain corpus statistics — the provenance
    breakdown (docs per domain, scheme mix, path depth) every web-scale
    corpus needs before domain-mix curation (see q_cap_per_group,
    q_sample_stratified).

    Each doc gets a deterministic synthetic source URL (the fixture ships
    none); the Spark side then treats the URL as OPAQUE and recovers
    host / path / query id with the JVM ``parse_url`` expression — the
    oracle reconstructs the same fields arithmetically, so any parse
    divergence fails the gate (n_bad_qid counts query-id mismatches and
    must be 0). Map-only parse + one hash-agg on host; at 100 TB the
    domain cardinality (~1e7) is far below doc count, so partial
    aggregation collapses the exchange."""
    docs = load_table(spark, sf_dir, "documents")
    hosts = [
        "en.wikipedia.org", "github.com", "arxiv.org",
        "news.ycombinator.com", "docs.python.org", "www.example.com",
        "blog.example.co.uk",
    ]
    host_lit = F.element_at(
        F.array(*[F.lit(h) for h in hosts]), (F.col("doc_id") % 7 + 1).cast("int")
    )
    scheme = F.when(F.col("doc_id") % 2 == 0, F.lit("https")).otherwise(F.lit("http"))
    path = (
        F.when(F.col("doc_id") % 4 == 1, F.lit("/docs"))
        .when(F.col("doc_id") % 4 == 2, F.lit("/docs/guide"))
        .when(F.col("doc_id") % 4 == 3, F.lit("/docs/guide/part3"))
        .otherwise(F.lit(""))
    )
    url = F.concat(
        scheme, F.lit("://"), host_lit, path,
        F.lit("?id="), F.col("doc_id").cast("string"),
    )
    parsed = docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("p_scheme"),
        F.parse_url(url, F.lit("PATH")).alias("p_path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("id")).alias("qid"),
    )
    depth = F.when(F.col("p_path") == "", F.lit(0)).otherwise(
        F.size(F.split(F.col("p_path"), "/")) - 1
    )
    return parsed.groupBy("host").agg(
        F.first(F.regexp_extract(F.col("host"), r"([^.]+)$", 1)).alias("tld"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("p_scheme") == "https", 1).otherwise(0)).alias("n_https"),
        portable_round(F.avg(depth), 4).alias("avg_path_depth"),
        F.sum(
            F.when(F.col("qid") != F.col("doc_id").cast("string"), 1).otherwise(0)
        ).alias("n_bad_qid"),
    ).select("host", "tld", "n_docs", "n_https", "avg_path_depth", "n_bad_qid")


@query(
    "q_pmi_bigrams",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ), uni AS (
        SELECT unnest(ws) AS t FROM w
    ), uc AS (
        SELECT t, COUNT(*) AS c FROM uni GROUP BY t
    ), bigl AS (
        SELECT list_transform(generate_series(1, greatest(len(ws) - 1, 0)),
                              i -> struct_pack(a := ws[i], b := ws[i+1])) AS bgs
        FROM w
    ), big AS (
        SELECT unnest(bgs, recursive := false) AS bg FROM bigl
    ), bc AS (
        SELECT bg.a AS a, bg.b AS b, COUNT(*) AS c_ab FROM big GROUP BY 1, 2
    ), tot AS (
        SELECT (SELECT COUNT(*) FROM uni) AS n_uni,
               (SELECT COUNT(*) FROM big) AS n_big
    )
    SELECT a, b, CAST(c_ab AS BIGINT) AS c_ab,
           CAST((CAST(floor(CAST((LN((c_ab * n_uni * n_uni)::DOUBLE
                         / (n_big::DOUBLE * ca.c * cb.c))) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS pmi
    FROM bc, tot
    JOIN uc ca ON bc.a = ca.t
    JOIN uc cb ON bc.b = cb.t
    WHERE c_ab >= 5
    ORDER BY c_ab DESC, a, b
    LIMIT 20
    """,
)
def q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram collocation mining: top-20 adjacent word pairs by frequency
    with pointwise mutual information — the collocation score corpus
    linguists (and tokenizer-vocabulary builders) compute before merging
    frequent pairs.

    PMI = ln(P(a,b) / (P(a)·P(b))) evaluated as one ln over a ratio of
    exact integer counts, so both engines feed ln the same rational;
    ranking is integer-deterministic (c_ab DESC, then pair text) à la
    q_tfidf_topterms — a ln() ulp can never flip a row. Scale: unigram
    and bigram count tables shuffle on the token key with map-side
    partial aggregation; the marginal-probability joins broadcast the
    (vocabulary-sized) unigram counts; top-20 is TakeOrdered, never a
    global sort."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    w = docs.select(words.alias("ws"))
    uni = w.select(F.explode(F.col("ws")).alias("t"))
    uc = uni.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    big = w.select(
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(ws) - 1, 0)),"
                " i -> struct(element_at(ws, i) AS a, element_at(ws, i + 1) AS b))"
            )
        ).alias("bg")
    ).select("bg.a", "bg.b")
    bc = big.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    totals = uni.agg(F.count(F.lit(1)).alias("n_uni")).crossJoin(
        big.agg(F.count(F.lit(1)).alias("n_big"))
    )
    ca = uc.select(F.col("t").alias("a"), F.col("c").alias("c_a"))
    cb = uc.select(F.col("t").alias("b"), F.col("c").alias("c_b"))
    scored = (
        bc.filter(F.col("c_ab") >= 5)
        .join(F.broadcast(ca), "a")
        .join(F.broadcast(cb), "b")
        .crossJoin(F.broadcast(totals))
        .select(
            "a",
            "b",
            "c_ab",
            portable_round(
                F.log(
                    (F.col("c_ab") * F.col("n_uni") * F.col("n_uni")).cast("double")
                    / (
                        F.col("n_big").cast("double")
                        * F.col("c_a")
                        * F.col("c_b")
                    )
                ),
                4,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("c_ab").desc(), "a", "b").limit(20)


@query(
    "q_lm_score",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ), uc AS (
        SELECT t, COUNT(*) AS c_a
        FROM (SELECT unnest(ws) AS t FROM w) GROUP BY t
    ), dbig AS (
        SELECT doc_id, bg.a AS a, bg.b AS b
        FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, greatest(len(ws) - 1, 0)),
                       i -> struct_pack(a := ws[i], b := ws[i+1])),
                       recursive := false) AS bg
            FROM w
        )
    ), bc AS (
        SELECT a, b, COUNT(*) AS c_ab FROM dbig GROUP BY a, b
    )
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST((CAST(floor(CAST((AVG(LN(bc.c_ab::DOUBLE / uc.c_a))) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE)
             AS avg_ll
    FROM dbig d
    JOIN bc ON d.a = bc.a AND d.b = bc.b
    JOIN uc ON d.a = uc.t
    GROUP BY d.doc_id
    """,
)
def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus self-perplexity: score every document by its average bigram
    log-likelihood under the MLE bigram LM trained on the corpus itself —
    ln P(b|a) = ln(c(a,b)/c(a)) averaged over the doc's adjacent pairs.
    The KenLM-filter shape of LLM data pipelines (atypical docs score low,
    boilerplate scores high) with the model TRAINED IN-PLAN: no external
    LM, every doc bigram exists in the counts so no smoothing/OOV branch.

    Determinism: each ln sees the identical small-integer rational in both
    engines; the averaged sum's float-order variance (~1e-14 on O(100)
    terms) cannot reach the 4dp round. Scale: bigram counts shuffle on
    the pair key with map-side combine; the doc⨝LM join is a hash join
    on the pair (the LM table is corpus-vocabulary-sized, NOT broadcast);
    unigram marginals broadcast. Three shuffles total, no collect."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    w = docs.select("doc_id", words.alias("ws"))
    uc = (
        w.select(F.explode("ws").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c_a"))
    )
    dbig = w.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(ws) - 1, 0)),"
                " i -> struct(element_at(ws, i) AS a, element_at(ws, i + 1) AS b))"
            )
        ).alias("bg"),
    ).select("doc_id", "bg.a", "bg.b")
    bc = dbig.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    return (
        dbig.join(bc, ["a", "b"])
        .join(F.broadcast(uc.withColumnRenamed("t", "a")), "a")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            portable_round(
                F.avg(F.log(F.col("c_ab").cast("double") / F.col("c_a"))), 4
            ).alias("avg_ll"),
        )
    )


# BPE-ish pre-tokenization: letter runs, digit runs, single non-space
# symbols — the GPT-2-style pre-split reduced to syntax RE2 (DuckDB) and
# the JVM regex engine interpret identically (no lookahead, no \p classes).
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@query(
    "q_token_count_bpe",
    oracle=f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text, '{_BPE_RE}'))) AS BIGINT)
             AS total_tokens,
           CAST((CAST(floor(CAST((CAST(SUM(length(text)) AS DOUBLE)
                      / SUM(len(regexp_extract_all(text, '{_BPE_RE}')))) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0)
                AS DOUBLE) AS chars_per_token
    FROM documents
    GROUP BY lang
    """,
)
def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting under a BPE-ish pre-tokenization regex (letter runs,
    digit runs, single symbols) — the budget metric LLM pipelines compute
    per corpus slice, next to the whitespace counts of q_text_stats.
    chars-per-token is the compression proxy used to convert byte budgets
    to token budgets. The regex is restricted to syntax RE2 (DuckDB) and
    the JVM engine tokenize identically, so counts are integer-exact on
    both sides; the ratio is ONE double division of those exact integer
    sums (identical IEEE quotient — a decimal division here rounds at a
    different scale per engine and was measured to flip a 4dp digit).
    Map-only scan + one hash agg of (lang, partial sums)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), F.lit(0)))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok).cast("bigint").alias("total_tokens"),
        portable_round(
            F.sum(F.length("text")).cast("double") / F.sum(n_tok), 4
        ).alias("chars_per_token"),
    )


@query(
    "q_sample_weighted",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, lang, length(text) AS w,
               LN((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 5))::BIGINT
                   + 1.0) / 1048577.0)
                 / length(text) AS k
        FROM documents
    )
    SELECT doc_id, lang, CAST(w AS BIGINT) AS w
    FROM keyed
    ORDER BY k DESC, doc_id
    LIMIT 20
    """,
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    each doc draws u from a HASH of its id (reproducible on any engine —
    no rand(), the same policy as q_hash_split) and ranks by
    ln(u)/weight; the top-k by that key IS a weighted sample without
    replacement, here weighted by document length (the quality-weighted
    selection step of training-data pipelines). Deterministic: u comes
    from 5 hex digits of md5(doc_id) — the engine-portable hash policy of
    q_hash_split (engine-native hash functions differ; DuckDB hash() is
    not Spark xxhash64) — so both engines draw identical u, asserted by
    the value-hash oracle with doc_id tie-break. Scale: map-only key
    computation + TakeOrdered top-k; no shuffle of the corpus, no global
    sort."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 5), 16, 10)
        .cast("long")
        + 1.0
    ) / 1048577.0
    k = F.log(u) / F.length("text")
    return (
        docs.select(
            "doc_id", "lang", F.length("text").cast("bigint").alias("w"),
            k.alias("k"),
        )
        .orderBy(F.col("k").desc(), "doc_id")
        .limit(20)
        .select("doc_id", "lang", "w")
    )


@query(
    "q_embed_centroids",
    oracle="""
    WITH ex AS (
        SELECT label, u.idx, u.val
        FROM embeddings,
             LATERAL (SELECT UNNEST(generate_series(1, len(embedding))) AS idx,
                             UNNEST(embedding) AS val) u
    ), dims AS (
        SELECT label, idx,
               CAST(SUM(CAST(val AS DECIMAL(38,12))) AS DOUBLE)
                 / COUNT(*) AS mean_d
        FROM ex GROUP BY label, idx
    )
    SELECT label,
           CAST((SELECT COUNT(*) FROM embeddings e WHERE e.label = dims.label)
                AS BIGINT) AS n_vectors,
           CAST((CAST(floor(CAST((SQRT(SUM(mean_d * mean_d))) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE)
             AS centroid_norm,
           CAST((CAST(floor(CAST((MAX(CASE WHEN idx = 1 THEN mean_d END)) AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS DOUBLE)
             AS dim0_mean
    FROM dims
    GROUP BY label
    """,
)
def q_embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids — the k-means M-step / class-prototype
    computation, distributed: posexplode each vector to (label, idx, val),
    ONE hash-aggregate per (label, dim) cell with EXACT-DECIMAL sums (a
    double sum across rows is shuffle-order-dependent; decimal is not),
    mean as one double division. Emits per-label count, centroid L2 norm
    (sum of 64 squared means — far below the 4dp round's sensitivity) and
    the decimal-exact first-dimension mean as the strong determinism
    probe. Scale: the exchange carries (label x 64-dim) cells, not
    vectors; partial aggregation collapses each partition first."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode("embedding").alias("idx0", "val")
    ).select("label", (F.col("idx0") + 1).alias("idx"), "val")
    dims = ex.groupBy("label", "idx").agg(
        (
            F.sum(F.col("val").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_d"),
        F.count(F.lit(1)).alias("n_in_dim"),
    )
    return dims.groupBy("label").agg(
        F.max("n_in_dim").cast("bigint").alias("n_vectors"),
        portable_round(F.sqrt(F.sum(F.col("mean_d") * F.col("mean_d"))), 4).alias(
            "centroid_norm"
        ),
        portable_round(
            F.max(F.when(F.col("idx") == 1, F.col("mean_d"))), 6
        ).alias("dim0_mean"),
    )


@query(
    "q_kmeans_assign",
    oracle=f"""
    WITH ex AS (
        SELECT vec_id, label, u.idx, u.val
        FROM embeddings,
             LATERAL (SELECT UNNEST(generate_series(1, len(embedding))) AS idx,
                             UNNEST(embedding) AS val) u
    ), cent AS (
        SELECT label AS c_label, idx,
               CAST(SUM(CAST(val AS DECIMAL(38,12))) AS DOUBLE)
                 / COUNT(*) AS mean_d
        FROM ex GROUP BY label, idx
    ), dist AS (
        SELECT e.vec_id, e.label, c.c_label,
               {sql_portable_round(sql_term_sum("(e.val - c.mean_d) * (e.val - c.mean_d)"), 9)} AS d2
        FROM ex e JOIN cent c ON e.idx = c.idx
        GROUP BY e.vec_id, e.label, c.c_label
    ), best AS (
        SELECT vec_id, label, c_label,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d2, c_label) AS rn
        FROM dist
    )
    SELECT label, c_label AS assigned,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM best WHERE rn = 1
    GROUP BY label, c_label
    """,
)
def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means E-step: assign every vector to its nearest per-label
    centroid (the M-step of q_embed_centroids) and report the
    label-vs-assigned confusion counts — one full EM iteration when
    composed. Centroids are decimal-exact means (deterministic), the 8
    centroid rows broadcast, each vector computes all 8 squared-L2
    distances in ONE zip_with/aggregate fold over its own array (fixed
    fold order — no cross-row float sums), argmin via row_number with a
    label tie-break. Scale: vectors stream map-side against the broadcast
    centroids; the only exchanges are the (label x dim) centroid agg and
    the final confusion-count agg."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("idx0", "val")
    ).select("vec_id", "label", (F.col("idx0") + 1).alias("idx"), "val")
    cent = (
        ex.groupBy(F.col("label").alias("c_label"), "idx")
        .agg(
            (
                F.sum(F.col("val").cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_d")
        )
        .groupBy("c_label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "mean_d"))),
                lambda s: s["mean_d"],
            ).alias("centroid")
        )
    )
    # per-term 12dp-rounded DECIMAL fold (round-9 hardening): the d²
    # sum is bit-identical regardless of accumulation order on either
    # engine, so no reassociation ulp can flip the argmin near-tie;
    # the 9dp round + c_label tie-break stay as the final defense
    d2 = fold_term_sum(
        F.zip_with(
            F.col("embedding"),
            F.col("centroid"),
            lambda v, c: (v - c) * (v - c),
        )
    )
    from pyspark.sql.window import Window

    dist = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "label", "c_label", portable_round(d2, 9).alias("d2")
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "c_label")
    return (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("label", F.col("c_label").alias("assigned"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_quality_gate",
    oracle=f"""
    WITH sig AS (
        SELECT doc_id, lang,
               len({_DUCK_TOKENS}) AS n_tokens,
               CASE WHEN len({_DUCK_TOKENS}) < 3 THEN 1.0 ELSE
                 len(list_distinct(list_transform(
                     generate_series(1, greatest(len({_DUCK_TOKENS}) - 2, 0)),
                     i -> {_DUCK_TOKENS}[i] || ' ' || {_DUCK_TOKENS}[i+1]
                          || ' ' || {_DUCK_TOKENS}[i+2])))::DOUBLE
                 / greatest(len({_DUCK_TOKENS}) - 2, 1) END AS distinct_ratio,
               length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))::DOUBLE
                 / greatest(length(text), 1) AS alpha_ratio
        FROM documents
    )
    SELECT doc_id, lang,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST((CAST(floor(CAST((distinct_ratio) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS distinct_ratio,
           CAST((CAST(floor(CAST((alpha_ratio) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS alpha_ratio,
           (n_tokens >= 30 AND distinct_ratio >= 0.6 AND alpha_ratio >= 0.6)
             AS keep
    FROM sig
    """,
)
def q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus quality GATE: compose the individual signals (token
    count, distinct-3gram repetition ratio, alphabetic-character ratio)
    into the keep/drop verdict an LLM pretraining filter actually applies
    — the decision step downstream of q_text_quality / q_repetition_score
    / q_lm_score. Every signal is a map-only JVM expression over the
    document's own text (ratios of exact integers, 4dp-rounded), so the
    gate streams the corpus once with zero shuffles and the verdict is
    bit-deterministic. Thresholds are the conventional conservative ones
    (≥30 tokens, ≥0.6 distinct ratio, ≥0.6 alpha ratio); at 100 TB this
    is THE pass that decides what the expensive downstream stages
    (dedup, LM scoring) even see."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    n_tok = F.size(toks)
    # slice/zip_with form (functions/text.py::word_shingles): an
    # element_at comprehension re-evaluates __toks per gram per position
    # whenever an optimizer rewrite (predicate pushdown, collapse)
    # inlines the alias — the corpus-pipeline round-7 bug class.
    g3 = word_shingles(F.col("__toks"), 3)
    with_toks = docs.withColumn("__toks", toks)
    distinct_ratio = F.when(F.size("__toks") < 3, F.lit(1.0)).otherwise(
        F.size(F.array_distinct(g3)).cast("double")
        / F.greatest(F.size("__toks") - 2, F.lit(1))
    )
    alpha_ratio = (
        F.length(F.regexp_replace("text", "[^A-Za-z ]", "")).cast("double")
        / F.greatest(F.length("text"), F.lit(1))
    )
    sig = with_toks.select(
        "doc_id",
        "lang",
        n_tok.cast("bigint").alias("n_tokens"),
        portable_round(distinct_ratio, 4).alias("distinct_ratio"),
        portable_round(alpha_ratio, 4).alias("alpha_ratio"),
        (
            (n_tok >= 30) & (distinct_ratio >= 0.6) & (alpha_ratio >= 0.6)
        ).alias("keep"),
    )
    return sig


@query(
    "q_text_canonicalize",
    oracle="""
    WITH canon AS (
        SELECT doc_id, lang, text,
               trim(regexp_replace(lower(text), ' +', ' ', 'g')) AS ctext
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN ctext <> text THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changed,
           CAST(SUM(length(text) - length(ctext)) AS BIGINT) AS chars_removed,
           md5(string_agg(md5(ctext), '' ORDER BY doc_id)) AS corpus_digest
    FROM canon
    GROUP BY lang
    """,
)
def q_text_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text canonicalization — the normalization pass upstream of every
    fingerprint/dedup stage: lowercase, collapse whitespace runs, trim.
    Output is the per-lang change audit plus a CORPUS DIGEST (md5 over
    the doc_id-ordered per-doc md5s), so the oracle verifies the
    canonical text of every document byte-for-byte, not just counts.
    Map-only pass + one hash agg; the ordered string_agg inside the
    digest is per-group (lang) over doc-id-ordered fixed-width hashes —
    deterministic on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    ctext = F.trim(F.regexp_replace(F.lower(F.col("text")), " +", " "))
    canon = docs.select(
        "doc_id",
        "lang",
        "text",
        ctext.alias("ctext"),
    )
    return (
        canon.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("ctext") != F.col("text")).cast("long")).alias("n_changed"),
            F.sum(F.length("text") - F.length("ctext"))
            .cast("bigint")
            .alias("chars_removed"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("doc_id", F.md5("ctext").alias("h")))
                        ),
                        lambda s: s["h"],
                    ),
                    "",
                ).cast("binary")
            ).alias("corpus_digest"),
        )
    )


@query(
    "q_cluster_purity",
    oracle=f"""
    WITH ex AS (
        SELECT vec_id, label, u.idx, u.val
        FROM embeddings,
             LATERAL (SELECT UNNEST(generate_series(1, len(embedding))) AS idx,
                             UNNEST(embedding) AS val) u
    ), cent AS (
        SELECT label AS c_label, idx,
               CAST(SUM(CAST(val AS DECIMAL(38,12))) AS DOUBLE)
                 / COUNT(*) AS mean_d
        FROM ex GROUP BY label, idx
    ), dist AS (
        SELECT e.vec_id, e.label, c.c_label,
               {sql_portable_round(sql_term_sum("(e.val - c.mean_d) * (e.val - c.mean_d)"), 9)} AS d2
        FROM ex e JOIN cent c ON e.idx = c.idx
        GROUP BY e.vec_id, e.label, c.c_label
    ), best AS (
        SELECT vec_id, label, c_label,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d2, c_label) AS rn
        FROM dist
    ), cm AS (
        SELECT label, c_label, CAST(COUNT(*) AS BIGINT) AS n
        FROM best WHERE rn = 1 GROUP BY label, c_label
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nn,
               CAST(COUNT(DISTINCT c_label) AS BIGINT) AS n_clusters
        FROM cm
    ), marg AS (
        SELECT 'l' AS side, label AS k, CAST(SUM(n) AS BIGINT) AS m
        FROM cm GROUP BY label
        UNION ALL
        SELECT 'c', c_label, CAST(SUM(n) AS BIGINT) FROM cm GROUP BY c_label
    ), maj AS (
        SELECT CAST(SUM(mx) AS BIGINT) AS hits FROM (
            SELECT c_label, MAX(n) AS mx FROM cm GROUP BY c_label)
    ), mi AS (
        SELECT SUM(CAST((CAST(floor(CAST(((CAST(cm.n AS DOUBLE) / t.nn)
                   * ln(CAST(t.nn AS DOUBLE) * cm.n
                        / (CAST(ml.m AS DOUBLE) * mc.m))) AS DOUBLE) * 1000000000000.0 + 0.5) AS DOUBLE) / 1000000000000.0)
               AS DECIMAL(38,12))) AS mi_sum
        FROM cm CROSS JOIN tot t
        JOIN marg ml ON ml.side = 'l' AND ml.k = cm.label
        JOIN marg mc ON mc.side = 'c' AND mc.k = cm.c_label
    ), ent AS (
        SELECT side,
               SUM(CAST((CAST(floor(CAST((-(CAST(m AS DOUBLE) / t.nn)
                              * ln(CAST(m AS DOUBLE) / t.nn)) AS DOUBLE) * 1000000000000.0 + 0.5) AS DOUBLE) / 1000000000000.0)
                   AS DECIMAL(38,12))) AS h
        FROM marg CROSS JOIN tot t GROUP BY side
    )
    SELECT t.nn AS n_vecs, t.n_clusters,
           CAST((CAST(floor(CAST((CAST(maj.hits AS DOUBLE) / t.nn) AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS DOUBLE)
               AS purity,
           CAST((CAST(floor(CAST((CAST(mi.mi_sum AS DOUBLE)
                      / sqrt(CAST(hl.h AS DOUBLE) * CAST(hc.h AS DOUBLE))) AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS DOUBLE) AS nmi
    FROM tot t CROSS JOIN maj CROSS JOIN mi
    CROSS JOIN (SELECT h FROM ent WHERE side = 'l') hl
    CROSS JOIN (SELECT h FROM ent WHERE side = 'c') hc
    """,
)
def q_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality evaluation over the k-means assignment
    (q_kmeans_assign's confusion matrix rolled into the two standard
    external metrics): purity = Σ_c max_l n_cl / N, and normalized
    mutual information MI/√(H_label·H_cluster). Every probability is an
    exact integer-count ratio; each MI/entropy CELL term computes in
    identical-tree double, rounds to 12dp, and accumulates in exact
    DECIMAL — so the Σ over contingency cells is partition-order
    independent (the same guard the kmeans argmin uses for its d2
    fold). Scale: the contingency matrix is (labels × clusters) —
    catalog-sized; everything downstream of the assignment's broadcast
    E-step is a few tiny aggs."""
    cm = (
        QUERIES["q_kmeans_assign"](spark, sf_dir)
        .withColumnRenamed("assigned", "c_label")
        .select("label", "c_label", F.col("n").cast("bigint").alias("n"))
        # the contingency matrix is catalog-sized (labels x clusters) but
        # feeds FIVE downstream branches (tot/ml/mc/hits/joined) — without
        # materialization each branch re-executes the whole kmeans-assign
        # pipeline (29 exchanges in the final plan; 7 with)
        .localCheckpoint(eager=True)
    )
    # tot/ml/mc are also multi-consumed (joined + entropies + final
    # select) — materialize the 1-row/marginal aggs once as well
    tot = cm.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.countDistinct("c_label").cast("bigint").alias("n_clusters"),
    ).localCheckpoint(eager=True)
    ml = (
        cm.groupBy("label")
        .agg(F.sum("n").cast("bigint").alias("ml"))
        .localCheckpoint(eager=True)
    )
    mc = (
        cm.groupBy("c_label")
        .agg(F.sum("n").cast("bigint").alias("mc"))
        .localCheckpoint(eager=True)
    )
    hits = (
        cm.groupBy("c_label")
        .agg(F.max("n").alias("mx"))
        .agg(F.sum("mx").cast("bigint").alias("hits"))
    )
    joined = (
        cm.join(F.broadcast(ml), "label")
        .join(F.broadcast(mc), "c_label")
        .crossJoin(F.broadcast(tot))
    )
    mi_term = portable_round(
        (F.col("n").cast("double") / F.col("nn"))
        * F.log(
            F.col("nn").cast("double")
            * F.col("n")
            / (F.col("ml").cast("double") * F.col("mc"))
        ),
        12,
    ).cast("decimal(38,12)")
    mi = joined.agg(F.sum(mi_term).alias("mi_sum"))

    def entropy(marg, col):
        term = portable_round(
            -(F.col(col).cast("double") / F.col("nn"))
            * F.log(F.col(col).cast("double") / F.col("nn")),
            12,
        ).cast("decimal(38,12)")
        return marg.crossJoin(F.broadcast(tot)).agg(F.sum(term).alias("h"))

    hl = entropy(ml, "ml").withColumnRenamed("h", "hl")
    hc = entropy(mc, "mc").withColumnRenamed("h", "hc")
    return (
        tot.crossJoin(F.broadcast(hits))
        .crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hl))
        .crossJoin(F.broadcast(hc))
        .select(
            F.col("nn").alias("n_vecs"),
            "n_clusters",
            portable_round(F.col("hits").cast("double") / F.col("nn"), 6)
            .cast("double")
            .alias("purity"),
            portable_round(
                F.col("mi_sum").cast("double")
                / F.sqrt(
                    F.col("hl").cast("double") * F.col("hc").cast("double")
                ),
                6,
            )
            .cast("double")
            .alias("nmi"),
        )
    )
