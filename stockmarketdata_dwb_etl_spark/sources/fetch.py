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
import time
import urllib.error
import urllib.request

DEFAULT_RETRIES = 3
DEFAULT_TIMEOUT_S = 3.0
DEFAULT_BACKOFF_S = 3.0


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
    _opener=None,
) -> dict[str, str]:
    """Fetch pages to ``out_dir`` as ``<name>.html`` files — the landing
    step before ``spark.read.format("htmltable").load(out_dir)``.

    ``urls``: mapping name -> url (the name becomes the page's stock_name
    via the file name, ref S7), or a bare list of urls (named from the
    url's last path segment). Already-landed pages are skipped when
    ``skip_existing`` so a restarted ingest only refetches what's missing
    — the idempotence the reference's CSV checkpoint provides (main.py's
    per-stock loop re-runs everything on failure; this doesn't).

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
    for name, url in urls.items():
        path = os.path.join(out_dir, f"{_slug(name)}.html")
        if not (skip_existing and os.path.exists(path)):
            body = fetch_page(
                url, retries=retries, timeout=timeout, backoff=backoff, _opener=_opener
            )
            tmp = path + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(body)
            os.replace(tmp, path)  # atomic: readers never see partial pages
        landed[name] = path
    return landed
