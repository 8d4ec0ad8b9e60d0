"""The reference-pipeline facade as an oracle-checked query: the full
bronze(string-scrape shape) → silver(typed) → gold(analytics) flow, with
the DuckDB oracle rebuilding the identical pipeline in SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pipelines.stock_ingest import build_gold
from stockmarketdata_dwb_etl_spark.registry import query

STOCK_PIPELINE_ORACLE = """
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
    ), silver AS (
        SELECT stock_name,
               CAST(strptime(date_str, '%b %-d, %Y') AS DATE) AS "Date",
               TRY_CAST(replace(price_str, ',', '') AS DOUBLE) AS "Price",
               TRY_CAST(replace(open_str, ',', '') AS DOUBLE) AS "Open",
               TRY_CAST(replace(high_str, ',', '') AS DOUBLE) AS "High",
               TRY_CAST(replace(low_str, ',', '') AS DOUBLE) AS "Low",
               TRY_CAST(substr(vol_str, 1, length(vol_str) - 1) AS DOUBLE) * 1e3 AS "Vol"
        FROM bronze
    )
    SELECT stock_name, "Date", "Price", "Open", "High", "Low", "Vol",
           CAST(ROUND(("Price" - LAG("Price") OVER w)
                 / nullif(LAG("Price") OVER w, 0) * 100, 4) AS DOUBLE) AS "Change",
           CAST(ROUND(AVG("Price") OVER (PARTITION BY stock_name ORDER BY "Date"
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS sma7
    FROM silver
    WINDOW w AS (PARTITION BY stock_name ORDER BY "Date")
"""


@query("q_stock_pipeline", oracle=STOCK_PIPELINE_ORACLE)
def q_stock_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end reference-pipeline semantics (pipelines/stock_ingest.py):
    scrape-shaped strings → parsing library → warehouse schema → OHLCV
    analytics. The engine's flagship integration query."""
    return build_gold(spark, sf_dir)
