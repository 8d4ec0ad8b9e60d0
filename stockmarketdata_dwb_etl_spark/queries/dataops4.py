"""Corpus-curation operators round 3: retrieval-grade relevance scoring
(BM25), robust outlier detection (median absolute deviation), cohort
distribution-drift measurement (PSI), and per-document word entropy.

These extend the text-quality / data-quality surface the reference's
clean-then-load stage implies (``/root/reference/dump_bigq.py:88-132``
runs fixed row transforms before the warehouse write; a 100 TB corpus
needs corpus-level quality signals too). Every query carries a full
DuckDB oracle.

Determinism policy (SURVEY.md §2B): integer counts everywhere possible;
``ln`` only over ratios of exact integers or identically-derived doubles;
any cross-row float sum goes through the decimal cast so accumulation
order cannot matter; ordering keys are rounded values with an integer
tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockmarketdata_dwb_etl_spark.catalog import load_table
from stockmarketdata_dwb_etl_spark.functions.text import tokenize
from stockmarketdata_dwb_etl_spark.registry import query

_DUCK_TOKENS = "list_filter(string_split(text, ' '), x -> x <> '')"

# Fixed retrieval query for BM25 — terms present across fixture vintages
# (the documents fixture draws from a small engine-vocabulary).
_BM25_TERMS = ("table", "join", "hash", "scan")
_BM25_K1 = 1.2
_BM25_B = 0.75


@query(
    "q_bm25_topk",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents
    ), dl AS (
        SELECT doc_id, len(w) AS dl FROM tok
    ), corpus AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CAST(dl AS BIGINT)) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl
    ), tf AS (
        SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(w) AS word FROM tok)
        WHERE word IN ('table', 'join', 'hash', 'scan')
        GROUP BY doc_id, word
    ), df AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY word
    ), scored AS (
        SELECT t.doc_id,
               CAST(
                 LN((c.n_docs - f.df + 0.5) / (f.df + 0.5) + 1)
                 * (t.tf * ({_BM25_K1} + 1))
                 / (t.tf + {_BM25_K1} * (1 - {_BM25_B}
                        + {_BM25_B} * d.dl / c.avgdl))
               AS DECIMAL(38,12)) AS term_score
        FROM tf t
        JOIN df f USING (word)
        JOIN dl d USING (doc_id)
        CROSS JOIN corpus c
    )
    SELECT doc_id,
           CAST(ROUND(SUM(term_score), 4) AS DOUBLE) AS bm25
    FROM scored
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 10
    """,
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document against a fixed term set; top 10.

    The retrieval primitive of corpus curation (quality-weighted sampling,
    eval-set mining). tf/df/dl are exact integers; idf feeds ln a rational
    of integers; the per-term scores are summed as decimals so the ≤4-term
    accumulation order cannot diverge between engines; final ordering is
    (rounded score, doc_id). Scale: one explode of the token stream
    filtered to the query terms (predicate pushed before the shuffle), a
    (doc, term) partial-agg, a broadcast of the |T|-row df table and the
    2-scalar corpus stats — the document table is never shuffled whole.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", tokenize(F.col("text")).alias("w"))
    dl = tok.select("doc_id", F.size("w").alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.col("dl").cast("bigint")).cast("double") / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    tf = (
        tok.select("doc_id", F.explode("w").alias("word"))
        .filter(F.col("word").isin(*_BM25_TERMS))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    term_score = (
        idf
        * (F.col("tf") * (_BM25_K1 + 1))
        / (
            F.col("tf")
            + _BM25_K1
            * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        )
    ).cast("decimal(38,12)")
    return (
        tf.join(F.broadcast(df), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select("doc_id", term_score.alias("term_score"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), 4).cast("double").alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(10)
    )


@query(
    "q_dedup_keep_canonical",
    oracle="""
    WITH RECURSIVE aug AS (
        SELECT doc_id, text, source FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text || ' zz1 zz2 zz3' AS text,
               source
        FROM documents WHERE doc_id % 10 = 0
    ), sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(w) - 2, 0)),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingles
        FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
              FROM aug)
    ), sizes AS (
        SELECT doc_id, len(shingles) AS n FROM sh
    ), ex AS (
        SELECT doc_id, unnest(shingles) AS s FROM sh
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), pairs AS (
        SELECT i.id_a AS a, i.id_b AS b
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.id_a
        JOIN sizes sb ON sb.doc_id = i.id_b
        WHERE ROUND(i.c::DOUBLE / (sa.n + sb.n - i.c), 4) >= 0.7
    ), und AS (
        SELECT a, b FROM pairs UNION SELECT b, a FROM pairs
    ), reach AS (
        SELECT a AS v, a AS r FROM (SELECT DISTINCT a FROM und)
        UNION
        SELECT und.b AS v, reach.r FROM reach JOIN und ON und.a = reach.v
    ), comp AS (
        SELECT v AS doc_id, MIN(r) AS rep FROM reach GROUP BY v
    ), labeled AS (
        SELECT d.doc_id, d.source, length(d.text) AS len,
               COALESCE(c.rep, d.doc_id) AS rep
        FROM aug d LEFT JOIN comp c USING (doc_id)
    ), ranked AS (
        SELECT source,
               row_number() OVER (PARTITION BY rep
                                  ORDER BY len DESC, doc_id) AS rn
        FROM labeled
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT)
               AS n_dropped
    FROM ranked GROUP BY source
    """,
)
def q_dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's FINAL step, composed end-to-end: MinHash-LSH
    near-dup pairs → transitive closure into clusters → keep ONE canonical
    document per cluster (longest text, doc_id tie-break) → per-source
    survival counts. This is the operator a training-data pipeline
    actually ships: q_dedup_minhash finds pairs, q_dedup_transitive
    groups them, this emits the kept corpus.

    Output is integer counts only — no float determinism surface. The
    oracle recomputes ground-truth pairs (inverted shingle index), the
    same closure via a recursive CTE, and the same keep rule. Scale: the
    pair/closure stages inherit the banded-LSH and O(diameter)
    label-propagation postures; canonical selection is one window over
    clustered docs (clusters are tiny; singletons never shuffle — they
    join `left` against the small component table)."""
    from stockmarketdata_dwb_etl_spark.operators.dedup import (
        connected_components,
        minhash_near_dups,
    )
    from stockmarketdata_dwb_etl_spark.queries.dataops2 import (
        _docs_with_near_dups,
    )
    from pyspark.sql.window import Window

    aug = _docs_with_near_dups(spark, sf_dir)
    pairs = minhash_near_dups(aug)
    comp = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    ).select(F.col("id").alias("doc_id"), F.col("cluster_rep").alias("rep"))
    labeled = (
        aug.select("doc_id", "source", F.length("text").alias("len"))
        .join(F.broadcast(comp), "doc_id", "left")
        .select(
            "source", "len", "doc_id",
            F.coalesce("rep", F.col("doc_id")).alias("rep"),
        )
    )
    w = Window.partitionBy("rep").orderBy(F.desc("len"), "doc_id")
    ranked = labeled.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.sum(F.when(F.col("rn") == 1, 0).otherwise(1))
        .cast("bigint")
        .alias("n_dropped"),
    )


@query(
    "q_skew_report",
    oracle="""
    WITH counts AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY user_id
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(MAX(n) AS BIGINT) AS max_n
        FROM counts
    )
    SELECT c.user_id, c.n,
           CAST(ROUND(c.n::DOUBLE / t.total, 4) AS DOUBLE) AS share,
           CAST(ROUND(c.n * t.n_keys::DOUBLE / t.total, 4) AS DOUBLE)
               AS skew_x
    FROM counts c CROSS JOIN tot t
    ORDER BY c.n DESC, c.user_id
    LIMIT 10
    """,
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-skew diagnostic over the natural shuffle key (user_id):
    the top-10 heaviest keys with their share of all rows and skew factor
    (count ÷ mean-count). This is the report that decides whether a
    join/agg on this key needs salting (q_join_salted_skew /
    q_agg_salted_skew are the remediations) — at 100 TB you run the
    diagnostic BEFORE the shuffle, on a sample or the previous run's
    stats. One partial-agg shuffle + a 1-row broadcast of the totals +
    TakeOrdered; shares are single double divisions of exact integers
    (no cross-row float sums)."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(
        F.sum("n").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("n").cast("bigint").alias("max_n"),
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "n",
            F.round(F.col("n").cast("double") / F.col("total"), 4).alias("share"),
            F.round(
                F.col("n") * F.col("n_keys").cast("double") / F.col("total"), 4
            ).alias("skew_x"),
        )
        .orderBy(F.desc("n"), "user_id")
        .limit(10)
    )


@query(
    "q_mad_outliers",
    oracle="""
    WITH med AS (
        SELECT event_type,
               ROUND(quantile_cont(value, 0.5), 6) AS med
        FROM events GROUP BY event_type
    ), dev AS (
        SELECT e.event_type, m.med, ABS(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)
    ), mad AS (
        SELECT event_type, med,
               ROUND(quantile_cont(adev, 0.5), 6) AS mad
        FROM dev GROUP BY event_type, med
    )
    SELECT d.event_type,
           CAST(ROUND(m.med, 4) AS DOUBLE) AS med,
           CAST(ROUND(m.mad, 4) AS DOUBLE) AS mad,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type, med)
    GROUP BY d.event_type, m.med, m.mad
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event_type: median absolute deviation,
    flagging |value − median| > 3·MAD.

    The robust alternative to q_zscore_outliers (a single corrupted batch
    moves a mean, not a median). Exact interpolated medians on both
    engines (Spark ``percentile``, DuckDB ``quantile_cont``), rounded to
    6dp BEFORE the threshold compare so a last-ulp interpolation
    difference cannot flip a boundary row's outlier flag. Scale note:
    exact percentile is a sort-based aggregate; at 100 TB the same
    pipeline runs with ``approx_percentile`` (documented trade — the
    oracle contract needs the exact form), and the two-pass shape
    (median, then deviations vs a broadcast 5-row median table) is the
    scale-correct design either way.
    """
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type", "med").agg(
        F.round(F.expr("percentile(adev, 0.5)"), 6).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), ["event_type", "med"])
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
        )
        .select(
            "event_type",
            F.round("med", 4).cast("double").alias("med"),
            F.round("mad", 4).cast("double").alias("mad"),
            "n",
            "n_outliers",
        )
    )


@query(
    "q_psi_drift",
    oracle="""
    WITH rng AS (
        SELECT MIN(value) AS lo, MAX(value) AS hi FROM events
    ), binned AS (
        SELECT event_type, event_id % 2 AS cohort,
               LEAST(CAST(FLOOR((value - r.lo) / ((r.hi - r.lo) / 10))
                          AS BIGINT), 9) AS bin
        FROM events CROSS JOIN rng r
    ), counts AS (
        SELECT event_type, cohort, bin, CAST(COUNT(*) AS BIGINT) AS c
        FROM binned GROUP BY event_type, cohort, bin
    ), grid AS (
        SELECT g.event_type, b.bin,
               COALESCE(a.c, 0) AS ca, COALESCE(bb.c, 0) AS cb
        FROM (SELECT DISTINCT event_type FROM counts) g
        CROSS JOIN (SELECT UNNEST(generate_series(0, 9)) AS bin) b
        LEFT JOIN counts a
               ON a.event_type = g.event_type AND a.bin = b.bin
              AND a.cohort = 0
        LEFT JOIN counts bb
               ON bb.event_type = g.event_type AND bb.bin = b.bin
              AND bb.cohort = 1
    ), tot AS (
        SELECT event_type,
               CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
        FROM grid GROUP BY event_type
    ), terms AS (
        SELECT g.event_type,
               CAST(
                 ((g.cb + 0.5) / (t.nb + 5.0) - (g.ca + 0.5) / (t.na + 5.0))
                 * LN(((g.cb + 0.5) / (t.nb + 5.0))
                      / ((g.ca + 0.5) / (t.na + 5.0)))
               AS DECIMAL(38,12)) AS term
        FROM grid g JOIN tot t USING (event_type)
    )
    SELECT event_type,
           CAST(ROUND(SUM(term), 4) AS DOUBLE) AS psi
    FROM terms GROUP BY event_type
    """,
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two hash-split cohorts of the
    event stream, per event_type — the standard drift alarm between a
    reference window and a live window (here the deterministic
    ``event_id % 2`` A/B split, the same sanity check a production
    pipeline runs to validate its own traffic splitter: PSI ≈ 0).

    values → 10 equal-width bins over the global [min, max] (bin edges
    derived identically on both engines), Laplace-smoothed shares, and
    PSI = Σ (p_b − p_a)·ln(p_b/p_a) accumulated as decimals so the
    10-term sum order cannot matter. Scale: two scans (global min/max,
    then a single (type, cohort, bin) partial-agg); the dense
    type×bin grid and totals are tiny broadcasts.
    """
    ev = load_table(spark, sf_dir, "events")
    rng = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    binned = ev.crossJoin(F.broadcast(rng)).select(
        "event_type",
        (F.col("event_id") % 2).alias("cohort"),
        F.least(
            F.floor(
                (F.col("value") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / 10)
            ).cast("bigint"),
            F.lit(9).cast("bigint"),
        ).alias("bin"),
    )
    counts = binned.groupBy("event_type", "cohort", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    types = counts.select("event_type").distinct()
    bins = spark.range(0, 10).select(F.col("id").alias("bin"))
    grid = (
        types.crossJoin(F.broadcast(bins))
        .join(
            F.broadcast(
                counts.filter(F.col("cohort") == 0).select(
                    "event_type", "bin", F.col("c").alias("ca")
                )
            ),
            ["event_type", "bin"],
            "left",
        )
        .join(
            F.broadcast(
                counts.filter(F.col("cohort") == 1).select(
                    "event_type", "bin", F.col("c").alias("cb")
                )
            ),
            ["event_type", "bin"],
            "left",
        )
        .select(
            "event_type",
            "bin",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    tot = grid.groupBy("event_type").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    pa = (F.col("ca") + 0.5) / (F.col("na") + 5.0)
    pb = (F.col("cb") + 0.5) / (F.col("nb") + 5.0)
    term = ((pb - pa) * F.log(pb / pa)).cast("decimal(38,12)")
    return (
        grid.join(F.broadcast(tot), "event_type")
        .select("event_type", term.alias("term"))
        .groupBy("event_type")
        .agg(F.round(F.sum("term"), 4).cast("double").alias("psi"))
    )


@query(
    "q_word_entropy",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, source, {_DUCK_TOKENS} AS w FROM documents
    ), wc AS (
        SELECT doc_id, source, word, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT doc_id, source, unnest(w) AS word FROM tok)
        GROUP BY doc_id, source, word
    ), dtot AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM wc GROUP BY doc_id
    ), ent AS (
        SELECT w.doc_id, w.source,
               ROUND(SUM(CAST(
                   -(w.c::DOUBLE / d.n) * LN(w.c::DOUBLE / d.n)
               AS DECIMAL(38,12))), 6) AS h
        FROM wc w JOIN dtot d USING (doc_id)
        GROUP BY w.doc_id, w.source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(ROUND(SUM(CAST(h AS DECIMAL(38,6))) / COUNT(*), 4)
                AS DOUBLE) AS avg_entropy,
           CAST(ROUND(MIN(h), 4) AS DOUBLE) AS min_entropy
    FROM ent GROUP BY source
    """,
)
def q_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon word entropy per document, aggregated per source — the
    classic gibberish/boilerplate detector (low entropy ⇒ repetitive
    template text; degenerate docs sink the per-source minimum).

    Each −p·ln p term feeds ln the same rational (c/n of exact integer
    counts) on both engines and is cast to decimal before BOTH cross-row
    sums (per-doc terms, per-source entropy average), so no accumulation
    order anywhere. Scale: one token explode into a (doc, word)
    partial-agg — the same shuffle profile as q_tokenize_wordcount — then
    per-doc and per-source hash-aggs over already-tiny keyed rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(
            "doc_id", "source", F.explode(tokenize(F.col("text"))).alias("word")
        )
        .groupBy("doc_id", "source", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dtot = wc.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    ent = (
        wc.join(dtot, "doc_id")
        .select(
            "doc_id", "source", (-p * F.log(p)).cast("decimal(38,12)").alias("t")
        )
        .groupBy("doc_id", "source")
        .agg(F.round(F.sum("t"), 6).alias("h"))
    )
    return ent.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum(F.col("h").cast("decimal(38,6)")) / F.count(F.lit(1)), 4
        )
        .cast("double")
        .alias("avg_entropy"),
        F.round(F.min("h"), 4).cast("double").alias("min_entropy"),
    )
