"""Arrow-vectorized Python UDF surface.

The engine's rule (SURVEY.md §2B scale posture): built-in Column expressions
first; when Python is genuinely needed, Arrow-batched pandas UDFs — never
row-at-a-time ``F.udf``. These implementations exist to prove the UDF
machinery end-to-end; parse_kmb_udf is semantically identical to the pure
expression ``functions.parsing.parse_kmb`` (dump_bigq.py:70-86) and is
differentially tested against it.

UDFs are built lazily (pandas_udf return-type parsing needs an active
SparkSession, which doesn't exist at import time) and cached.
"""

from __future__ import annotations

import functools
# module-level so pandas_udf's string-hint resolution (postponed
# annotations) can find it in the function globals
from collections.abc import Iterator  # noqa: F401

import pandas as pd
from pyspark.sql.functions import pandas_udf

from stockmarketdata_dwb_etl_spark.functions.parsing import KMB_MULTIPLIERS


@functools.cache
def parse_kmb_udf():
    """Vectorized K/M/B parse (reference semantics, dump_bigq.py:70-86):
    '763.44M' → 763_440_000.0; ''/'nan'/bad → NULL."""

    @pandas_udf("double")
    def _parse_kmb(raw: pd.Series) -> pd.Series:
        t = raw.str.strip()
        t = t.mask(t.eq("") | t.str.lower().eq("nan"))
        mult = t.str[-1:].map(KMB_MULTIPLIERS)
        body = t.str[:-1].where(mult.notna(), t).str.replace(",", "", regex=False)
        parsed = pd.to_numeric(body, errors="coerce")
        return parsed * mult.fillna(1.0)

    return _parse_kmb


@functools.cache
def weighted_avg_udf():
    """Grouped-agg pandas UDF: sum(value*weight)/sum(weight) per group.
    pandas sums are pairwise (more accurate than sequential) — callers
    round to 4dp per the oracle determinism policy."""

    @pandas_udf("double")
    def _weighted_avg(value: pd.Series, weight: pd.Series) -> float:
        wsum = float(weight.sum())
        if wsum == 0.0:
            return None
        return float((value * weight).sum() / wsum)

    return _weighted_avg


@functools.cache
def self_weighted_udf():
    """Grouped-agg pandas UDF usable over WINDOW frames: self-weighted
    mean sum(v^2)/sum(v) — the custom rolling-metric shape; NaN-safe on
    empty/zero frames."""

    @pandas_udf("double")
    def _self_weighted(value: pd.Series) -> float:
        s = float(value.sum())
        if s == 0.0:
            return None
        return float((value * value).sum() / s)

    return _self_weighted


@functools.cache
def ticker_extract_iter_udf():
    """SCALAR_ITER pandas UDF: Iterator[pd.Series] -> Iterator[pd.Series].
    The iterator form exists for expensive per-executor initialization
    (model weights, compiled automata) amortized across ALL Arrow batches
    of a partition instead of paid per batch — the ML-inference UDF
    shape. Here the amortized resource is a compiled regex; the work per
    row (first ALL-CAPS token of a text) is trivially re-expressible in
    SQL, which is what the oracle does."""
    import re

    @pandas_udf("string")
    def _extract(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # re.ASCII: the oracle's RE2 \b is ASCII-only, Python's default
        # \b is Unicode-aware — pin to the oracle's semantics
        pat = re.compile(r"\b[A-Z]{2,}\b", re.ASCII)  # per-worker init, once

        def first_caps(t):
            m = pat.search(t or "")
            return m.group(0) if m else None

        for s in batches:
            yield s.map(first_caps)

    return _extract
