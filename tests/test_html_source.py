"""Scrape-semantics tests for the htmltable Python Data Source: class-regex
table location, first-thead-wins schema, malformed-row drop, page tagging,
partition-per-page parallelism."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_html_source_scrape_semantics(spark):
    from pipelines.stock_ingest import build_bronze
    from stockmarketdata_dwb_etl_spark.queries.sources_q import write_fixture_pages
    from stockmarketdata_dwb_etl_spark.sources.htmltable import register

    pages = write_fixture_pages(spark, SF_DIR)
    register(spark)
    raw = spark.read.format("htmltable").option("path", pages).load()

    # schema: stock_name + the matching table's thead (decoy table skipped)
    assert raw.columns == ["stock_name", "Date", "Price", "Open", "High", "Low", "Vol."]
    assert "Decoy" not in raw.columns

    # every well-formed bronze row survives; the injected arity-2 row per
    # page is dropped (ref S6)
    n_bronze = build_bronze(spark, SF_DIR).count()
    assert raw.count() == n_bronze

    # one partition per page → the scrape parallelizes across pages
    n_pages = raw.select("stock_name").distinct().count()
    assert raw.rdd.getNumPartitions() == n_pages
