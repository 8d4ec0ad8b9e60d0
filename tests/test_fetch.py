"""Fetch-prologue tests (ref S1 semantics: retry with pause, land to files,
idempotent re-runs) — the network is faked with an in-process opener."""

from __future__ import annotations

import io
import urllib.error

import pytest

from stockmarketdata_dwb_etl_spark.sources.fetch import (
    derive_stock_links,
    fetch_page,
    fetch_pages,
)


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


# --- S9: politeness throttle (ref main.py:111 time.sleep(2) per stock) ---


def test_fetch_pages_pause_between_fetches(tmp_path):
    bodies = {f"http://x/{n}": f"<html>{n}</html>".encode() for n in ("a", "b", "c")}
    opener, _ = _opener_factory(bodies)
    sleeps: list[float] = []
    fetch_pages(
        {"A": "http://x/a", "B": "http://x/b", "C": "http://x/c"},
        str(tmp_path / "p"),
        backoff=0.0,
        pause_s=2.0,
        _opener=opener,
        _sleep=sleeps.append,
    )
    # pause BETWEEN fetches: 3 pages -> 2 pauses, each honoring pause_s
    assert sleeps == [2.0, 2.0]


def test_fetch_pages_pause_skips_cache_hits(tmp_path):
    bodies = {"http://x/a": b"<html>a</html>", "http://x/b": b"<html>b</html>"}
    opener, _ = _opener_factory(bodies)
    out = str(tmp_path / "p")
    fetch_pages({"A": "http://x/a"}, out, backoff=0.0, _opener=opener)
    sleeps: list[float] = []
    # A is already landed: only B fetches, so no pause is owed at all
    fetch_pages(
        {"A": "http://x/a", "B": "http://x/b"},
        out,
        backoff=0.0,
        pause_s=2.0,
        _opener=opener,
        _sleep=sleeps.append,
    )
    assert sleeps == []


# --- S3: index-page link derivation (ref main.py:26-46 get_stock_link) ---

_INDEX_HTML = """
<html><body>
<table><tbody class="common-datatable-v2">
  <tr><td><a href="/equities/apple-computer-inc">Apple Inc</a></td><td>227.5</td></tr>
  <tr><td><a href="https://www.investing.com/equities/microsoft-corp">Microsoft</a></td></tr>
  <tr><td><a href="equities/nvidia-corp">NVIDIA</a></td></tr>
  <tr><td>no link here</td></tr>
  <tr><td><a href="">Empty Href Co</a></td></tr>
  <tr><td><a href="/equities/alphabet-inc">Alphabet</a> <a href="/ignored">x</a></td></tr>
</tbody></table>
<tbody class="other"><tr><td><a href="/nope">Nope</a></td></tr></tbody>
</body></html>
"""


def test_derive_stock_links_three_href_cases():
    links = derive_stock_links(_INDEX_HTML, "https://www.investing.com")
    assert links == {
        # root-relative: base + href + suffix
        "Apple Inc": "https://www.investing.com/equities/apple-computer-inc-historical-data",
        # absolute: href + suffix
        "Microsoft": "https://www.investing.com/equities/microsoft-corp-historical-data",
        # bare-relative: base + "/" + href + suffix
        "NVIDIA": "https://www.investing.com/equities/nvidia-corp-historical-data",
        # first <a> per row wins; linkless / empty-href rows are skipped
        "Alphabet": "https://www.investing.com/equities/alphabet-inc-historical-data",
    }


def test_derive_stock_links_bytes_and_feeds_fetch_pages(tmp_path):
    links = derive_stock_links(_INDEX_HTML.encode(), "https://www.investing.com/")
    assert len(links) == 4
    bodies = {u: b"<html>page</html>" for u in links.values()}
    opener, _ = _opener_factory(bodies)
    landed = fetch_pages(links, str(tmp_path / "p"), backoff=0.0, _opener=opener)
    assert sorted(landed) == sorted(links)


def test_derive_stock_links_no_matching_tbody():
    assert derive_stock_links("<html><table><tbody><tr></tr></tbody></table></html>",
                              "https://x") == {}
