"""Source-surface queries: the HTML-table scrape stage end-to-end.

q_html_source replays the reference's whole extract+type flow on engine
rails: deterministic fixture pages (one per synthetic index, the scraped
table shape of /root/reference/stock_data.csv) → the ``htmltable`` Python
Data Source (class-regex table location, first-thead-wins schema, malformed
row drop, stock_name tagging) → rename normalization (``Vol.`` → ``Vol``,
ref T3) → the parsing expression library (ref T1/T2/T4). The DuckDB oracle
rebuilds the same silver relation straight from the events fixture, so the
whole HTML roundtrip is value-checked, not just row-counted.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipelines.stock_ingest import build_bronze
from stockmarketdata_dwb_etl_spark.functions.parsing import (
    parse_kmb,
    parse_mdy_date,
    parse_money,
)
from stockmarketdata_dwb_etl_spark.registry import query
from stockmarketdata_dwb_etl_spark.functions.exact import portable_round
from stockmarketdata_dwb_etl_spark.scratch import fixture_tag
from stockmarketdata_dwb_etl_spark.sources.htmltable import register

SCRATCH = "/root/repo/.scratch"

_PAGE_TMPL = """<!DOCTYPE html>
<html><head><title>{name} historical data</title></head><body>
<table class="common-table">
  <thead><tr><th>Decoy</th></tr></thead>
  <tbody><tr><td>ignored: class does not match the locator regex</td></tr></tbody>
</table>
<table class="freeze-column-w-1 datatable-v2">
  <thead><tr>
    <th>Date</th><th>Price</th><th>Open</th><th>High</th><th>Low</th><th>Vol.</th>
  </tr></thead>
  <tbody>
{rows}
  </tbody>
</table>
</body></html>
"""

_ROW_TMPL = (
    "    <tr><td>{d}</td><td>{p}</td><td>{o}</td>"
    "<td>{h}</td><td>{lo}</td><td>{v}</td></tr>"
)

#: deliberately malformed row (arity 2 ≠ 6) — the source must drop it
#: (ref S6), keeping the oracle comparison exact.
_BAD_ROW = "    <tr><td>Jan 1, 1970</td><td>oops</td></tr>"


def write_fixture_pages(spark: SparkSession, sf_dir: str) -> str:
    """One deterministic HTML page per synthetic index, rendered from the
    bronze bars (driver-side by design: fixture generation, not a query
    path). Idempotent per sf_dir."""
    tag = fixture_tag(sf_dir)
    out = os.path.join(SCRATCH, "html_pages", tag)
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    pages: dict[str, list[str]] = {}
    for r in build_bronze(spark, sf_dir).collect():
        pages.setdefault(r["stock_name"], []).append(
            _ROW_TMPL.format(
                d=r["date_str"],
                p=r["price_str"],
                o=r["open_str"],
                h=r["high_str"],
                lo=r["low_str"],
                v=r["vol_str"],
            )
        )
    for name, rows in pages.items():
        rows.append(_BAD_ROW)
        with open(os.path.join(out, f"{name}.html"), "w", encoding="utf-8") as fh:
            fh.write(_PAGE_TMPL.format(name=name, rows="\n".join(rows)))
    with open(marker, "w", encoding="utf-8"):
        pass
    return out


HTML_SILVER_ORACLE = """
    WITH bars AS (
        SELECT 'IDX' || CAST(user_id % 10 AS VARCHAR) AS stock_name,
               CAST(ts AS DATE) AS d,
               arg_min(value, ts) AS open_v,
               arg_max(value, ts) AS close_v,
               MAX(value) AS high_v,
               MIN(value) AS low_v,
               SUM(value) AS vol_v
        FROM events
        GROUP BY 1, 2
    ), bronze AS (
        SELECT stock_name,
               strftime(d, '%b %-d, %Y') AS date_str,
               printf('%.2f', (CAST(floor(CAST((close_v) AS DOUBLE) * 100.0 + 0.5) AS DOUBLE) / 100.0)) AS price_str,
               printf('%.2f', (CAST(floor(CAST((open_v) AS DOUBLE) * 100.0 + 0.5) AS DOUBLE) / 100.0)) AS open_str,
               printf('%.2f', (CAST(floor(CAST((high_v) AS DOUBLE) * 100.0 + 0.5) AS DOUBLE) / 100.0)) AS high_str,
               printf('%.2f', (CAST(floor(CAST((low_v) AS DOUBLE) * 100.0 + 0.5) AS DOUBLE) / 100.0)) AS low_str,
               printf('%.2f', (CAST(floor(CAST((vol_v / 1000) AS DOUBLE) * 100.0 + 0.5) AS DOUBLE) / 100.0)) || 'K' AS vol_str
        FROM bars
    )
    SELECT stock_name,
           CAST(strptime(date_str, '%b %-d, %Y') AS DATE) AS "Date",
           TRY_CAST(replace(price_str, ',', '') AS DOUBLE) AS "Price",
           TRY_CAST(replace(open_str, ',', '') AS DOUBLE) AS "Open",
           TRY_CAST(replace(high_str, ',', '') AS DOUBLE) AS "High",
           TRY_CAST(replace(low_str, ',', '') AS DOUBLE) AS "Low",
           TRY_CAST(substr(vol_str, 1, length(vol_str) - 1) AS DOUBLE) * 1e3 AS "Vol"
    FROM bronze
"""


@query("q_html_source", oracle=HTML_SILVER_ORACLE)
def q_html_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML scrape → typed silver, end-to-end on the custom Python Data
    Source (sources/htmltable.py); every page is one input partition."""
    pages = write_fixture_pages(spark, sf_dir)
    register(spark)
    raw = spark.read.format("htmltable").option("path", pages).load()
    # ref T3 rename normalization: first match of the volume-name variants
    vol_src = next(c for c in ("Vol", "Vol.", "Volume", "VOL") if c in raw.columns)
    raw = raw.withColumnRenamed(vol_src, "Vol_raw")
    return raw.select(
        "stock_name",
        parse_mdy_date(F.col("Date")).alias("Date"),
        parse_money(F.col("Price")).alias("Price"),
        parse_money(F.col("Open")).alias("Open"),
        parse_money(F.col("High")).alias("High"),
        parse_money(F.col("Low")).alias("Low"),
        parse_kmb(F.col("Vol_raw")).alias("Vol"),
    )


@query(
    "q_csv_permissive",
    oracle="""
    SELECT CAST(COUNT(CASE WHEN o_orderkey % 17 <> 0 THEN 1 END) AS BIGINT)
               AS n_good,
           CAST(COUNT(CASE WHEN o_orderkey % 17 = 0 THEN 1 END) AS BIGINT)
               AS n_corrupt,
           CAST((CAST(floor(CAST((SUM(CASE WHEN o_orderkey % 17 <> 0
                                    THEN o_totalprice END)) AS DOUBLE) * 100.0 + 0.5) AS DOUBLE) / 100.0) AS DOUBLE)
               AS sum_good_price,
           CAST(0 AS BIGINT) AS n_null_keys
    FROM orders
    """,
)
def q_csv_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record quarantine on CSV ingest: the file carries one
    malformed line per 17 orders (single-token garbage instead of the
    2-field record); a PERMISSIVE schema read with
    ``columnNameOfCorruptRecord`` parses good rows typed, null-fills the
    bad ones, and captures each offending raw line in the corrupt column —
    the keep-and-quarantine upgrade of the reference's silent drop
    (ref S6, /root/reference/main.py:96-101: rows with wrong arity are
    discarded). Counts and the good-row sum are checked arithmetically.

    Scale: the text write and the CSV parse are both distributed and
    map-only (one pass, no shuffle before the final 1-row agg); corrupt
    capture costs nothing on the happy path since the raw line is only
    retained when parsing fails."""
    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

    from stockmarketdata_dwb_etl_spark.catalog import load_table

    tag = fixture_tag(sf_dir)
    out = os.path.join(SCRATCH, "csv_permissive", tag)
    orders = load_table(spark, sf_dir, "orders")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        lines = orders.select(
            F.when(
                F.col("o_orderkey") % 17 == 0,
                F.concat(F.lit("garbage_"), F.col("o_orderkey").cast("string")),
            )
            .otherwise(
                F.concat_ws(
                    ",",
                    F.col("o_orderkey").cast("string"),
                    F.format_string("%.2f", F.col("o_totalprice")),
                )
            )
            .alias("value")
        )
        lines.write.mode("overwrite").text(out)
    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_totalprice", DoubleType()),
            StructField("_bad", StringType()),
        ]
    )
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(out)
    )
    # Every data column must be referenced: CSV column pruning otherwise
    # skips parsing unrequested fields, and a row can only be flagged
    # corrupt if the failing field is actually parsed (n_null_keys also
    # proves no good row lost its key: it is 0 in both engines).
    return parsed.agg(
        F.count(F.when(F.col("_bad").isNull(), 1)).alias("n_good"),
        F.count(F.when(F.col("_bad").isNotNull(), 1)).alias("n_corrupt"),
        portable_round(
            F.sum(F.when(F.col("_bad").isNull(), F.col("o_totalprice"))), 2
        ).alias("sum_good_price"),
        F.count(
            F.when(F.col("_bad").isNull() & F.col("o_orderkey").isNull(), 1)
        ).alias("n_null_keys"),
    )


@query(
    "q_json_quarantine",
    oracle="""
    SELECT CAST(SUM(CASE WHEN o_orderkey % 17 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bad,
           CAST(SUM(CASE WHEN o_orderkey % 17 <> 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_good,
           CAST((CAST(floor(CAST((SUM(CASE WHEN o_orderkey % 17 <> 0
                               THEN CAST(o_totalprice AS DECIMAL(38,6))
                               ELSE 0 END)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS good_sum
    FROM orders
    """,
)
def q_json_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record quarantine on JSONL ingest — the same
    keep-and-quarantine contract as q_csv_permissive on the format LLM
    corpora actually ship in: every 17th order is written as a TRUNCATED
    JSON object (unparseable), the PERMISSIVE read types the good rows
    and captures each bad raw line in ``columnNameOfCorruptRecord``.
    Counts and the good-row exact sum are the oracle-checked output.
    Scale: distributed text write + map-only JSON parse, one 1-row agg;
    the corrupt column is only materialized on parse failure."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from stockmarketdata_dwb_etl_spark.catalog import load_table

    tag = fixture_tag(sf_dir)
    out = os.path.join(SCRATCH, "json_quarantine", tag)
    orders = load_table(spark, sf_dir, "orders")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        good = F.format_string(
            '{"o_orderkey": %s, "o_totalprice": %.2f}',
            F.col("o_orderkey").cast("string"),
            F.col("o_totalprice"),
        )
        bad = F.format_string(
            '{"o_orderkey": %s, "o_totalpr', F.col("o_orderkey").cast("string")
        )
        orders.select(
            F.when(F.col("o_orderkey") % 17 == 0, bad).otherwise(good).alias("value")
        ).write.mode("overwrite").text(out)
    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_totalprice", DoubleType()),
            StructField("_bad", StringType()),
        ]
    )
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(out)
    )
    return parsed.agg(
        F.count("_bad").alias("n_bad"),
        F.count("o_totalprice").alias("n_good"),
        portable_round(
            F.sum(F.coalesce(F.col("o_totalprice").cast("decimal(38,6)"), F.lit(0))),
            4,
        )
        .cast("double")
        .alias("good_sum"),
    )


@query(
    "q_xml_source",
    oracle="""
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST((CAST(floor(CAST((SUM(CAST(s_acctbal AS DECIMAL(38,6)))) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE)
             AS total_bal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_xml_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink + source roundtrip on Spark 4's NATIVE XML data source
    (spark-xml was folded into core in 4.0 — no external package): write
    suppliers as <supplier> row elements, read back with rowTag + explicit
    schema, join the nation dim and aggregate — values must survive the
    markup roundtrip exactly (exact-decimal sums; schema pinned so XML's
    type inference cannot drift it). Completes the text-format family
    next to CSV/JSONL: the B2B-feed ingestion path (vendor data still
    ships as XML) with the same distributed one-pass read."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from stockmarketdata_dwb_etl_spark.catalog import load_table

    tag = fixture_tag(sf_dir)
    out = os.path.join(SCRATCH, "supplier_xml", tag)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            load_table(spark, sf_dir, "supplier")
            .select("s_suppkey", "s_nationkey", "s_acctbal")
            .write.format("xml")
            .option("rootTag", "suppliers")
            .option("rowTag", "supplier")
            .mode("overwrite")
            .save(out)
        )
    schema = StructType(
        [
            StructField("s_suppkey", LongType()),
            StructField("s_nationkey", LongType()),
            StructField("s_acctbal", DoubleType()),
        ]
    )
    back = (
        spark.read.format("xml").option("rowTag", "supplier").schema(schema).load(out)
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        back.join(F.broadcast(nation), back["s_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            portable_round(F.sum(F.col("s_acctbal").cast("decimal(38,6)")), 4)
            .cast("double")
            .alias("total_bal"),
        )
    )


@query(
    "q_binaryfile_source",
    oracle="""
    WITH sel AS (
        SELECT doc_id, n_chars, substr(text, 1, 24) AS prefix
        FROM documents WHERE doc_id % 5 = 0
        ORDER BY doc_id LIMIT 200
    ),
    expected AS (
        SELECT doc_id,
               'MEDIA'::BLOB
                 || unhex(lpad(to_hex(doc_id), 16, '0'))
                 || prefix::BLOB AS payload,
               n_chars
        FROM sel
    )
    SELECT doc_id,
           CAST(octet_length(payload) AS BIGINT) AS n_bytes,
           hex(payload) AS payload_hex,
           CAST(octet_length(payload) = 13 + least(n_chars, 24) AS BOOLEAN)
             AS size_ok
    FROM expected
    ORDER BY doc_id
    """,
)
def q_binaryfile_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-file binary ingest — the multimodal LANDING path: raw media
    files read with Spark's ``binaryFile`` source into (path, length,
    content) rows, keyed by filename, hex-encoded in full (the oracle
    RECONSTRUCTS the exact byte stream in SQL, 'MEDIA'::BLOB || 8-byte
    big-endian id || text prefix, and hex-compares it byte-for-byte, so
    any read corruption or truncation fails the gate), and
    size-validated against the catalog. This is the step
    BEFORE sources/multimodal.py's in-table decode operators: files land
    as opaque bytes, metadata joins in from the warehouse. Fixture media
    (header + 8-byte id + 24-char text prefix) generate driver-side once
    per fixture vintage (scratch.fixture_tag idempotence). Scales:
    binaryFile is a distributed file scan (one row per file, splittable
    listing); the md5/length projection is map-only; the catalog join
    broadcasts the dimension side."""
    from stockmarketdata_dwb_etl_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = os.path.join(
        "/root/repo/.scratch", f"binmedia_{fixture_tag(sf_dir)}"
    )
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(out, exist_ok=True)
        rows = (
            docs.filter(F.col("doc_id") % 5 == 0)
            .select("doc_id", F.substring("text", 1, 24).alias("prefix"))
            .orderBy("doc_id")
            .limit(200)
            .collect()  # driver-side fixture generation, by design
        )
        for r in rows:
            payload = (
                b"MEDIA"
                + int(r.doc_id).to_bytes(8, "big")
                + r.prefix.encode("utf-8")
            )
            with open(os.path.join(out, f"doc_{r.doc_id:06d}.bin"), "wb") as f:
                f.write(payload)
        with open(marker, "w") as f:
            f.write("")
    scanned = (
        spark.read.format("binaryFile")
        .load(out)
        .filter(F.col("path").endswith(".bin"))
        .select(
            F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin", 1)
            .cast("bigint")
            .alias("doc_id"),
            F.col("length").cast("bigint").alias("n_bytes"),
            F.hex(F.col("content")).alias("payload_hex"),
        )
    )
    return (
        scanned.join(F.broadcast(docs.select("doc_id", "n_chars")), "doc_id")
        .select(
            "doc_id",
            "n_bytes",
            "payload_hex",
            (
                F.col("n_bytes")
                == F.lit(13) + F.least(F.col("n_chars"), F.lit(24))
            ).alias("size_ok"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_text_source_lines",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id,
           CAST((CAST(floor(CAST((CAST(SUM(length(text)) AS DOUBLE) / COUNT(*)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0)
                AS DOUBLE) AS avg_chars
    FROM documents GROUP BY source ORDER BY source
    """,
)
def q_text_source_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-delimited text sink + source round-trip — the landing format
    raw corpora actually arrive in (one document per line, tab-separated
    id/source prefix; cf. the reference's CSV file handoff, ref S10/S11
    main.py:123-133). Distributed map-only write via the text sink, read
    back with ``spark.read.text``, fields re-parsed with two bounded
    splits — no regex, JVM-side. The oracle computes the same per-source
    stats from the ORIGINAL table: a hash match proves the line
    round-trip is lossless (fixture text is tab/newline-free; a
    production writer would escape). Scale: write and read are both
    map-only passes; the only shuffle is the final per-source agg."""
    from stockmarketdata_dwb_etl_spark.catalog import load_table

    tag = fixture_tag(sf_dir)
    out = os.path.join(SCRATCH, "text_lines", tag)
    docs = load_table(spark, sf_dir, "documents")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        docs.select(
            F.concat_ws(
                "\t",
                F.col("doc_id").cast("string"),
                F.col("source"),
                F.col("text"),
            ).alias("value")
        ).write.mode("overwrite").text(out)
    lines = spark.read.text(out)
    parsed = lines.select(
        F.split_part(F.col("value"), F.lit("\t"), F.lit(1))
        .cast("bigint")
        .alias("doc_id"),
        F.split_part(F.col("value"), F.lit("\t"), F.lit(2)).alias("source"),
        # text = everything after the second tab (substr, not split —
        # the payload itself may legitimately contain the delimiter in
        # other corpora)
        F.expr(
            "substring(value, length(split_part(value, '\t', 1))"
            " + length(split_part(value, '\t', 2)) + 3)"
        ).alias("text"),
    )
    return (
        parsed.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.length("text")).cast("bigint").alias("total_chars"),
            F.max("doc_id").cast("bigint").alias("max_doc_id"),
            portable_round(
                F.sum(F.length("text")).cast("double") / F.count(F.lit(1)), 4
            )
            .cast("double")
            .alias("avg_chars"),
        )
        .orderBy("source")
    )


@query(
    "q_csv_multiline",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(length('seg: ' || c_mktsegment || chr(10)
                           || 'cust: ' || c_name)) AS BIGINT)
               AS total_note_chars,
           CAST(MAX(c_custkey) AS BIGINT) AS max_key
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q_csv_multiline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quoted-multiline CSV round-trip — the ingestion wrinkle that
    breaks naive line-splitting readers: a note column containing a
    REAL embedded newline is written quoted, then read back with
    ``multiLine=true`` (each logical record spans two physical lines).
    The oracle recomputes the per-segment stats from the base table —
    a hash match proves the embedded newline survived the sink→source
    round-trip byte-for-byte. Scale note (the honest trade): multiLine
    CSV files are NOT splittable (a record boundary cannot be found
    mid-file), so each file parses as one unit — the layout answer is
    many moderate files, which the distributed write already produces;
    the non-multiline path (q_csv_roundtrip) stays the splittable
    default."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from stockmarketdata_dwb_etl_spark.catalog import load_table

    tag = fixture_tag(sf_dir)
    out = os.path.join(SCRATCH, "csv_multiline", tag)
    cust = load_table(spark, sf_dir, "customer")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            cust.select(
                "c_custkey",
                "c_mktsegment",
                F.concat(
                    F.lit("seg: "),
                    F.col("c_mktsegment"),
                    F.lit("\n"),
                    F.lit("cust: "),
                    F.col("c_name"),
                ).alias("note"),
            )
            .write.mode("overwrite")
            .option("header", True)
            .option("quoteAll", True)
            .csv(out)
        )
    schema = StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_mktsegment", StringType()),
            StructField("note", StringType()),
        ]
    )
    back = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .schema(schema)
        .csv(out)
    )
    return (
        back.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.length("note")).cast("bigint").alias("total_note_chars"),
            F.max("c_custkey").cast("bigint").alias("max_key"),
        )
        .orderBy("c_mktsegment")
    )
