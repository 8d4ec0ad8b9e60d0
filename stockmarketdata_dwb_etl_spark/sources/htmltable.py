"""HTML-table Python Data Source — the reference's scrape stage as a real
Spark source.

The reference extracts OHLCV rows from HTML tables: locate the table by a
class regex (main.py:53-54,76-77), infer column names from the first
non-empty <thead> (S4, main.py:83-88 — "first wins" for every page), strip
each <td> and zip with the headers (S5, main.py:98-103), drop rows whose
cell count mismatches the header arity (S6, main.py:102), and tag each row
with the page's stock name (S7, main.py:104). This module re-expresses that
as a PySpark 4 Python Data Source: each page is an input partition, so a
1000-page scrape parses on 1000 cores; schema inference happens once on the
driver from the first page, exactly the reference's first-thead-wins rule.

Parsing uses stdlib ``html.parser`` (no bs4 dependency) and is
deterministic. Network fetching stays out of the executor path by design —
pages land on storage first (the reference's own CSV-checkpoint instinct,
generalized); the source then scans them like any other file format.
"""

from __future__ import annotations

import glob
import os
import re
from html.parser import HTMLParser

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StringType, StructField, StructType

#: default table-locator regex, same spirit as the reference's
#: ``freeze-column`` / ``datatable`` class matching.
DEFAULT_TABLE_CLASS = r".*(freeze-column|datatable).*"


class _TableParser(HTMLParser):
    """Collect headers + rows of the first <table> whose class matches."""

    def __init__(self, class_re: str) -> None:
        super().__init__()
        self.class_re = re.compile(class_re)
        self.headers: list[str] = []
        self.rows: list[list[str]] = []
        self._in_table = False
        self._nest = 0  # depth of tables nested INSIDE the matched one
        self._done = False
        self._in_th = False
        self._in_td = False
        self._cell: list[str] = []
        self._row: list[str] | None = None

    def handle_starttag(self, tag: str, attrs) -> None:
        if self._done:
            return
        attrs = dict(attrs)
        if tag == "table":
            if self._in_table:
                self._nest += 1  # nested table: skip, but track its close
            elif self.class_re.match(attrs.get("class") or ""):
                # `or ""`: a valueless class attribute parses as None
                self._in_table = True
            return
        if not self._in_table or self._nest:
            return
        if tag == "tr":
            self._row = []
        elif tag == "th":
            self._in_th = True
            self._cell = []
        elif tag == "td":
            self._in_td = True
            self._cell = []

    def handle_endtag(self, tag: str) -> None:
        if self._done or not self._in_table:
            return
        if tag == "table":
            if self._nest:  # closing a nested table, not the matched one
                self._nest -= 1
            else:
                self._in_table = False
                self._done = True
            return
        if self._nest:
            return
        if tag == "th":
            self._in_th = False
            text = "".join(self._cell).strip()
            if text:
                self.headers.append(text)
        elif tag == "td":
            self._in_td = False
            if self._row is not None:  # a <td> outside any <tr>: drop it
                self._row.append("".join(self._cell).strip())
        elif tag == "tr":
            if self._row:
                self.rows.append(self._row)
            self._row = None

    def handle_data(self, data: str) -> None:
        if self._done or self._nest:
            return
        if self._in_th or self._in_td:
            self._cell.append(data)


def parse_page(path: str, class_re: str = DEFAULT_TABLE_CLASS):
    """(headers, rows) of the first matching table in one HTML file."""
    p = _TableParser(class_re)
    with open(path, encoding="utf-8") as fh:
        p.feed(fh.read())
    return p.headers, p.rows


def _stock_name(path: str) -> str:
    """Page identity → stock_name (ref S7; the reference takes it from the
    link row, we take it from the page file name)."""
    return os.path.splitext(os.path.basename(path))[0].replace("_", " ")


class HtmlTableReader(DataSourceReader):
    def __init__(self, schema: StructType, options) -> None:
        self.schema = schema
        self.path = options.get("path")
        self.class_re = options.get("table_class", DEFAULT_TABLE_CLASS)

    def partitions(self):
        files = sorted(glob.glob(os.path.join(self.path, "*.html")))
        return [InputPartition(f) for f in files]

    def read(self, partition):
        path = partition.value
        headers, rows = parse_page(path, self.class_re)
        name = _stock_name(path)
        fields = [f.name for f in self.schema.fields if f.name != "stock_name"]
        for row in rows:
            if len(row) != len(headers):  # ref S6: drop malformed rows
                continue
            d = dict(zip(headers, row))
            # align this page's header order to the inferred schema;
            # columns the page lacks → NULL (ref's dict semantics)
            yield tuple([name] + [d.get(f) for f in fields])


class HtmlTableDataSource(DataSource):
    """``spark.read.format("htmltable").load(dir)``: every ``*.html`` page
    in ``dir`` becomes one partition of all-string rows tagged with the
    page's stock_name."""

    @classmethod
    def name(cls) -> str:
        return "htmltable"

    def schema(self) -> StructType:
        # first non-empty thead wins (ref S4) — inferred on the driver from
        # the lexically-first page, then applied to every partition
        files = sorted(glob.glob(os.path.join(self.options.get("path"), "*.html")))
        headers: list[str] = []
        for f in files:
            headers, _ = parse_page(
                f, self.options.get("table_class", DEFAULT_TABLE_CLASS)
            )
            if headers:
                break
        if not headers:
            raise ValueError(f"no matching table with headers under {self.options.get('path')!r}")
        return StructType(
            [StructField("stock_name", StringType())]
            + [StructField(h, StringType()) for h in headers]
        )

    def reader(self, schema: StructType) -> HtmlTableReader:
        return HtmlTableReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(HtmlTableDataSource)
