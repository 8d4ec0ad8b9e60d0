"""Differential-compare harness mirroring the driver's oracle check:
row-count + schema-arity + order-insensitive value comparison with columns
sorted by name.

STRICTER than the external driver is known to be, on two axes the r08
round proved matter (VERDICT r08 "What's wrong" #1/#2):

- floats canonicalize at 9dp (was 4dp). The driver's value hash flagged
  sub-1e-6 divergences the 4dp canon here waved through (q_feature_scale);
  the repo's portable_round discipline makes matched outputs bit-identical
  cross-engine, so 9dp costs nothing on a correct query and catches the
  low-bit drift class early.
- top-level array/map/struct output columns are REJECTED outright. The
  driver canonicalizes via pandas ``sort_values``/``factorize`` over all
  output columns, which raises "unhashable type: 'list'" on array cells
  (q_one_hot_encode, r08). The engine's output contract therefore forbids
  nested top-level columns — emit a string (concat_ws/to_json) or an
  integer bitmask instead.
"""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pandas as pd

FLOAT_DP = 9


def canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        r = round(f, FLOAT_DP) + 0.0  # normalize -0.0
        return f"{r:.{FLOAT_DP}f}"
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "NULL"
        return v.isoformat()
    if isinstance(v, dt.datetime):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, dt.date):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if v is pd.NaT:
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def _first_non_null(col: pd.Series):
    for v in col:
        if v is None or v is pd.NaT:
            continue
        if isinstance(v, float) and math.isnan(v):
            continue
        return v
    return None


def reject_unsortable_columns(df: pd.DataFrame, name: str, side: str):
    """Fail any frame whose top-level column holds nested values.

    The external driver's canonicalizer pandas-sorts every output column;
    list/array/dict/struct cells crash it ("unhashable type: 'list'",
    q_one_hot_encode r08). Enforce the output contract here so the class
    is caught in-repo before a driver round burns on it."""
    for c in df.columns:
        if df[c].dtype != object:
            continue
        # scan EVERY value, not just the first non-null: a mixed column
        # whose first non-null is a scalar but whose later rows hold
        # lists/dicts must not slip past this gate (ADVICE r09)
        for v in df[c]:
            if isinstance(v, (list, tuple, set, dict, np.ndarray)):
                raise AssertionError(
                    f"{name}: {side} column {c!r} holds a top-level"
                    f" {type(v).__name__} — nested output columns break the"
                    " driver's sort_values canonicalizer; emit a string"
                    " (concat_ws/to_json) or an integer bitmask instead"
                )


def canon_frame(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns, key=str.lower), axis=1)
    rows = [tuple(canon_value(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    s_cols = sorted(c.lower() for c in spark_pdf.columns)
    o_cols = sorted(c.lower() for c in oracle_pdf.columns)
    assert s_cols == o_cols, f"{name}: column mismatch spark={s_cols} oracle={o_cols}"
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    reject_unsortable_columns(spark_pdf, name, "spark")
    reject_unsortable_columns(oracle_pdf, name, "oracle")
    s_rows = canon_frame(spark_pdf)
    o_rows = canon_frame(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
