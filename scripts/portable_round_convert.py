"""One-off codemod: convert engine-native rounding to the portable floor
form in query modules whose oracles compare doubles at the driver's 4dp
gate.

Why: Spark ``F.round(double, n)`` (BigDecimal HALF_UP on the shortest
decimal representation) and DuckDB ``ROUND(double, n)`` (scaled-double
rounding) disagree exactly at half boundaries, so every regenerated
fixture is a fresh lottery against the differential gate (observed flip:
q_stochastic at sf0.1). ``floor(x*10^n + 0.5)/10^n`` is bit-identical on
both engines. This tool rewrites BOTH sides of each pair:

- Python side: ``F.round(`` -> ``portable_round(`` (same signature), and
  adds the import if missing.
- SQL side (oracle strings): ``ROUND(expr, n)`` / ``round(expr)`` ->
  ``(CAST(floor(CAST((expr) AS DOUBLE) * 10^n + 0.5) AS DOUBLE) / 10^n)``
  via balanced-paren parsing; sites whose second argument is not an
  integer literal are left untouched and reported.

Decimal-exact rounds (``ROUND(SUM(CAST(.. AS DECIMAL..)), n)`` with no
intermediate DOUBLE cast) do not occur in the target files (verified by
grep before running); the repo's exact-decimal policy lives in
functions/exact.py which this tool never touches.

Usage: python scripts/portable_round_convert.py FILE [FILE ...]
"""

from __future__ import annotations

import re
import sys

IMPORT_LINE = (
    "from stockmarketdata_dwb_etl_spark.functions.exact import portable_round\n"
)

_SQL_ROUND = re.compile(r"(?<![\w.])round\s*\(", re.IGNORECASE)


def _split_top_level(s: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def _convert_sql(text: str) -> tuple[str, int, list[str]]:
    out, pos, n_conv, skipped = [], 0, 0, []
    while True:
        m = _SQL_ROUND.search(text, pos)
        if not m:
            out.append(text[pos:])
            break
        start = m.end()  # just past the '('
        depth, i = 1, start
        while depth and i < len(text):
            if text[i] == "(":
                depth += 1
            elif text[i] == ")":
                depth -= 1
            i += 1
        inner = text[start : i - 1]
        args = _split_top_level(inner)
        nd = None
        if len(args) == 1:
            nd = 0
        elif len(args) == 2 and re.fullmatch(r"\s*\d+\s*", args[1]):
            nd = int(args[1])
        if nd is None:
            skipped.append(inner[:60].replace("\n", " "))
            out.append(text[pos:i])
            pos = i
            continue
        scale = float(10**nd)
        expr = args[0].strip()
        out.append(text[pos : m.start()])
        out.append(
            f"(CAST(floor(CAST(({expr}) AS DOUBLE) * {scale} + 0.5)"
            f" AS DOUBLE) / {scale})"
        )
        pos = i
        n_conv += 1
    return "".join(out), n_conv, skipped


def convert(path: str) -> None:
    with open(path) as f:
        text = f.read()
    n_py = text.count("F.round(")
    text = text.replace("F.round(", "portable_round(")
    text, n_sql, skipped = _convert_sql(text)
    if "portable_round" in text and not re.search(
        r"^from stockmarketdata_dwb_etl_spark\.functions\.exact import .*\bportable_round\b",
        text,
        re.M,
    ):
        m_anchor = re.search(
            r"^from stockmarketdata_dwb_etl_spark\.catalog import", text, re.M
        )
        idx = m_anchor.start() if m_anchor else -1
        if idx < 0:
            # fall back: after the last pyspark import line
            m = None
            for m in re.finditer(r"^from pyspark[.\w]* import .*\n", text, re.M):
                pass
            if m is None:
                raise SystemExit(f"{path}: no import anchor found")
            idx = m.end()
        text = text[:idx] + IMPORT_LINE.replace(
            "\n", "  # noqa: E501\n"
        ) + text[idx:]
        # keep it simple: plain line, alphabetical-ish placement
        text = text.replace(
            IMPORT_LINE.replace("\n", "  # noqa: E501\n"), IMPORT_LINE, 1
        )
    print(f"{path}: {n_py} F.round sites, {n_sql} SQL ROUND sites converted")
    for s in skipped:
        print(f"  SKIPPED (non-literal ndigits): {s}")
    with open(path, "w") as f:
        f.write(text)


if __name__ == "__main__":
    for p in sys.argv[1:]:
        convert(p)
