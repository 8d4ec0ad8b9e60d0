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
