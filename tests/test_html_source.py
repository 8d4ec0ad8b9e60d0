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


def test_parser_robustness_edge_cases(tmp_path):
    """Malformed-HTML hardening: valueless class attr, nested tables inside
    the matched table, stray <td> outside any <tr>."""
    from stockmarketdata_dwb_etl_spark.sources.htmltable import parse_page

    page = tmp_path / "edge.html"
    page.write_text(
        """
        <table class><tr><td>ignored: valueless class, no crash</td></tr></table>
        <table class="datatable">
          <thead><tr><th>A</th><th>B</th></tr></thead>
          <td>stray cell outside tr</td>
          <tr><td>1</td><td>2</td></tr>
          <tr><td><table class="inner"><tr><td>nested</td></tr></table>3</td><td>4</td></tr>
          <tr><td>5</td><td>6</td></tr>
        </table>
        """
    )
    headers, rows = parse_page(str(page))
    assert headers == ["A", "B"]
    # nested-table content is skipped, rows after it still captured
    assert rows == [["1", "2"], ["3", "4"], ["5", "6"]]
