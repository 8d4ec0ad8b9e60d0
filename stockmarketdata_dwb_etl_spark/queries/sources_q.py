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
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
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
               printf('%.2f', ROUND(close_v, 2)) AS price_str,
               printf('%.2f', ROUND(open_v, 2)) AS open_str,
               printf('%.2f', ROUND(high_v, 2)) AS high_str,
               printf('%.2f', ROUND(low_v, 2)) AS low_str,
               printf('%.2f', ROUND(vol_v / 1000, 2)) || 'K' AS vol_str
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
