"""Driver-side page fetch prologue for the scrape surface (ref S1).

The reference fetches each stock page over HTTP with a retry loop before
parsing (``/root/reference/main.py:7-24``: requests.get with a timeout,
retrying on failure with a pause between attempts). The engine keeps the
NETWORK out of the executor path — a 1000-core cluster hammering a source
site from every task is an anti-pattern (no politeness control, retries
multiply, a straggler page stalls a whole stage). Instead this prologue
runs on the driver (or any single ingest node), lands pages as files, and
the ``htmltable`` data source then scans them with one partition per page.

stdlib-only (urllib), no external dependency.
"""

from __future__ import annotations

import os
import re
import time
import urllib.error
import urllib.request
from html.parser import HTMLParser

DEFAULT_RETRIES = 3
DEFAULT_TIMEOUT_S = 3.0
DEFAULT_BACKOFF_S = 3.0

#: index-page table-body locator, same spirit as the reference's
#: ``.*datatable.*`` class regex (main.py:53-54).
DEFAULT_INDEX_CLASS = r".*datatable.*"


def _slug(name: str) -> str:
    return "".join(c if c.isalnum() else "_" for c in name).strip("_") or "page"


def fetch_page(
    url: str,
    retries: int = DEFAULT_RETRIES,
    timeout: float = DEFAULT_TIMEOUT_S,
    backoff: float = DEFAULT_BACKOFF_S,
    _opener=None,
) -> bytes:
    """GET one page with the reference's retry/pause semantics
    (main.py:14-24: try, on failure sleep and retry, up to N attempts).
    Raises the last error after ``retries`` failed attempts."""
    opener = _opener or urllib.request.urlopen
    last_exc: Exception | None = None
    for attempt in range(retries):
        try:
            with opener(url, timeout=timeout) as resp:
                return resp.read()
        except (urllib.error.URLError, OSError) as exc:  # noqa: PERF203
            last_exc = exc
            if attempt < retries - 1:
                time.sleep(backoff)
    raise last_exc  # type: ignore[misc]


def fetch_pages(
    urls: dict[str, str] | list[str],
    out_dir: str,
    retries: int = DEFAULT_RETRIES,
    timeout: float = DEFAULT_TIMEOUT_S,
    backoff: float = DEFAULT_BACKOFF_S,
    skip_existing: bool = True,
    pause_s: float = 0.0,
    _opener=None,
    _sleep=time.sleep,
) -> dict[str, str]:
    """Fetch pages to ``out_dir`` as ``<name>.html`` files — the landing
    step before ``spark.read.format("htmltable").load(out_dir)``.

    ``urls``: mapping name -> url (the name becomes the page's stock_name
    via the file name, ref S7), or a bare list of urls (named from the
    url's last path segment). Already-landed pages are skipped when
    ``skip_existing`` so a restarted ingest only refetches what's missing
    — the idempotence the reference's CSV checkpoint provides (main.py's
    per-stock loop re-runs everything on failure; this doesn't).

    ``pause_s`` is the politeness throttle between consecutive page GETs
    (ref S9, main.py:111: ``time.sleep(2)`` after each stock "to avoid
    hitting rate limits"). The pause applies only after an actual fetch —
    skip_existing cache hits don't burden the source site, so they don't
    pay it — and never after the last page.

    Returns name -> landed file path for the pages fetched or found.
    Failures propagate after the per-page retry budget: a scrape that
    silently drops pages poisons every downstream aggregate.
    """
    if not isinstance(urls, dict):
        urls = {
            _slug(os.path.splitext(u.rstrip("/").rsplit("/", 1)[-1])[0]): u
            for u in urls
        }
    os.makedirs(out_dir, exist_ok=True)
    landed: dict[str, str] = {}
    pending = False  # a fetch happened and the next fetch owes a pause
    for name, url in urls.items():
        path = os.path.join(out_dir, f"{_slug(name)}.html")
        if not (skip_existing and os.path.exists(path)):
            if pending and pause_s > 0:
                _sleep(pause_s)
            body = fetch_page(
                url, retries=retries, timeout=timeout, backoff=backoff, _opener=_opener
            )
            tmp = path + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(body)
            os.replace(tmp, path)  # atomic: readers never see partial pages
            pending = True
        landed[name] = path
    return landed


class _LinkRowParser(HTMLParser):
    """Collect each ``<tr>``'s first ``<a href>`` (url + anchor text) from
    the first ``<tbody>`` whose class matches — the index-page row walk of
    ref main.py:53-63 (``soup.find("tbody", class_=datatable_re)`` then
    per-row ``row.find("a")``), stdlib-only."""

    def __init__(self, class_re: str) -> None:
        super().__init__()
        self.class_re = re.compile(class_re)
        self.links: list[tuple[str, str]] = []  # (href, anchor text)
        self._in_tbody = False
        self._done = False
        self._row_has_link = False
        self._in_a = False
        self._href = ""
        self._text: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if self._done:
            return
        attrs = dict(attrs)
        if tag == "tbody" and not self._in_tbody:
            if self.class_re.match(attrs.get("class") or ""):
                self._in_tbody = True
        elif self._in_tbody and tag == "tr":
            self._row_has_link = False
        elif self._in_tbody and tag == "a" and not self._row_has_link:
            self._in_a = True
            self._href = attrs.get("href") or ""
            self._text = []

    def handle_endtag(self, tag: str) -> None:
        if self._done:
            return
        if tag == "a" and self._in_a:
            self._in_a = False
            self._row_has_link = True
            self.links.append((self._href, "".join(self._text).strip()))
        elif tag == "tbody" and self._in_tbody:
            self._in_tbody = False
            self._done = True  # first matching tbody wins, like soup.find

    def handle_data(self, data: str) -> None:
        if self._in_a:
            self._text.append(data)


def derive_stock_links(
    index_html: str | bytes,
    base_url: str,
    class_re: str = DEFAULT_INDEX_CLASS,
    suffix: str = "-historical-data",
) -> dict[str, str]:
    """Derive per-stock history-page URLs from an index page (ref S3,
    ``/root/reference/main.py:26-46`` ``get_stock_link``): for each row of
    the class-matched table body, take the first link's anchor text as the
    stock display name and build ``<url><suffix>`` with the reference's
    3-case href handling — absolute (``http...``) used as-is, root-relative
    (``/...``) appended to ``base_url``, bare-relative joined with a ``/``.

    Returns name -> url, ready to hand to :func:`fetch_pages`. Rows with
    no link or an empty href are skipped (the reference would crash on
    them; a scrape prologue should not). Later duplicates of a display
    name win, matching dict-update semantics downstream.
    """
    if isinstance(index_html, bytes):
        index_html = index_html.decode("utf-8", errors="replace")
    p = _LinkRowParser(class_re)
    p.feed(index_html)
    base = base_url.rstrip("/")
    out: dict[str, str] = {}
    for href, text in p.links:
        if not href or not text:
            continue
        if href.startswith("http"):
            url = f"{href}{suffix}"
        elif href.startswith("/"):
            url = f"{base}{href}{suffix}"
        else:
            url = f"{base}/{href}{suffix}"
        out[text] = url
    return out
