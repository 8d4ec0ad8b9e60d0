"""Fetch-prologue tests (ref S1 semantics: retry with pause, land to files,
idempotent re-runs) — the network is faked with an in-process opener."""

from __future__ import annotations

import io
import urllib.error

import pytest

from stockmarketdata_dwb_etl_spark.sources.fetch import fetch_page, fetch_pages


class _FakeResponse(io.BytesIO):
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _opener_factory(bodies: dict[str, bytes], fail_first: int = 0):
    """Opener failing the first ``fail_first`` calls, then serving bodies."""
    calls = {"n": 0}

    def opener(url, timeout=None):
        calls["n"] += 1
        if calls["n"] <= fail_first:
            raise urllib.error.URLError("transient")
        return _FakeResponse(bodies[url])

    return opener, calls


def test_fetch_page_retries_then_succeeds():
    opener, calls = _opener_factory({"http://x/a": b"<html>ok</html>"}, fail_first=2)
    body = fetch_page("http://x/a", retries=3, backoff=0.0, _opener=opener)
    assert body == b"<html>ok</html>"
    assert calls["n"] == 3  # 2 failures + 1 success


def test_fetch_page_exhausts_retries():
    opener, calls = _opener_factory({}, fail_first=99)
    with pytest.raises(urllib.error.URLError):
        fetch_page("http://x/a", retries=3, backoff=0.0, _opener=opener)
    assert calls["n"] == 3


def test_fetch_pages_lands_and_skips_existing(tmp_path):
    bodies = {"http://x/aapl": b"<html>1</html>", "http://x/msft": b"<html>2</html>"}
    opener, calls = _opener_factory(bodies)
    out = str(tmp_path / "pages")
    landed = fetch_pages(
        {"AAPL": "http://x/aapl", "MSFT": "http://x/msft"},
        out,
        backoff=0.0,
        _opener=opener,
    )
    assert sorted(landed) == ["AAPL", "MSFT"]
    assert open(landed["AAPL"], "rb").read() == b"<html>1</html>"
    assert calls["n"] == 2

    # idempotent restart: nothing refetched
    fetch_pages(
        {"AAPL": "http://x/aapl", "MSFT": "http://x/msft"},
        out,
        backoff=0.0,
        _opener=opener,
    )
    assert calls["n"] == 2


def test_fetch_pages_list_names_from_url(tmp_path):
    opener, _ = _opener_factory({"http://x/stocks/tsla.html": b"<html>t</html>"})
    landed = fetch_pages(
        ["http://x/stocks/tsla.html"], str(tmp_path), backoff=0.0, _opener=opener
    )
    assert list(landed) == ["tsla"]
    assert landed["tsla"].endswith("tsla.html")


def test_scrape_path_end_to_end(spark, tmp_path):
    """URL → landed file → htmltable DataSource scan → typed silver, in one
    pass: the full reference pipeline shape (S1 fetch prologue + S2-S7
    scrape source) with the network faked at the opener seam. The scanned
    silver must row-match q_html_source, which reads the same pages from
    the fixture landing dir."""
    from tests.conftest import SF_DIR
    from stockmarketdata_dwb_etl_spark.queries.sources_q import (
        q_html_source,
        write_fixture_pages,
    )
    from stockmarketdata_dwb_etl_spark.sources.htmltable import register

    fixture_dir = write_fixture_pages(spark, SF_DIR)
    import glob
    import os

    bodies = {}
    urls = {}
    for p in sorted(glob.glob(os.path.join(fixture_dir, "*.html"))):
        name = os.path.splitext(os.path.basename(p))[0]
        url = f"http://quotes.example/{name}"
        urls[name] = url
        bodies[url] = open(p, "rb").read()

    opener, calls = _opener_factory(bodies, fail_first=1)  # one transient error
    landing = str(tmp_path / "landing")
    landed = fetch_pages(urls, landing, backoff=0.0, _opener=opener)
    assert sorted(landed) == sorted(urls)
    assert calls["n"] == len(urls) + 1  # every page fetched once + 1 retry

    register(spark)
    raw = spark.read.format("htmltable").option("path", landing).load()
    assert raw.rdd.getNumPartitions() == len(urls)  # partition per page

    silver = q_html_source(spark, SF_DIR)
    assert raw.count() == silver.count()
    # the landed scan carries the same per-page tags as the fixture scan
    got = {r["stock_name"] for r in raw.select("stock_name").distinct().collect()}
    want = {r["stock_name"] for r in silver.select("stock_name").distinct().collect()}
    assert got == want
