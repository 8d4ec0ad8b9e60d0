"""As-of (time-travel) join — composed from union + window, shuffle-once.

Spark's DataFrame API has no native ASOF JOIN (DuckDB does). The naive
range-join formulation (``l.ts >= r.ts`` + pick max) explodes to a
near-cartesian product per key at scale. This implementation instead:

1. unions both sides into one stream tagged by side,
2. sorts within each key partition by (ts, side) — one shuffle total,
3. carries the latest right-side payload forward with
   ``last(..., ignorenulls=True)`` over an unbounded-preceding frame,
4. keeps only left rows.

Cost at 100 TB: a single hash-partition shuffle on the key (same as any
join) + a per-partition sort — no row multiplication, skew handled by AQE.
Right rows at exactly ``left.ts`` are matched (backward-inclusive), same as
DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    right_payload: Sequence[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: every left row + the right-side payload of the most
    recent right row with ``right.ts <= left.ts`` for the same key.

    ``left`` and ``right`` must both expose ``key_cols`` and ``ts_col``;
    ``right_payload`` names the right columns to carry (must not collide
    with left columns — rename upstream).

    ``tolerance_seconds`` bounds staleness (the pandas ``merge_asof``
    tolerance / feature-store point-in-time shape): a match older than the
    bound yields NULL payload instead — computed by carrying the matched
    right row's own ts in the payload struct and nulling after the fill,
    so the plan is unchanged (same single shuffle + window).
    """
    key_cols = list(key_cols)
    left_payload = [c for c in left.columns if c not in key_cols and c != ts_col]

    # The right payload travels as ONE struct so a NULL payload *field*
    # cannot be back-filled from an older right row than the other fields —
    # last(ignorenulls) skips only whole missing rows (left-side rows).
    # The matched right ts rides along as __rts for the tolerance check.
    payload_struct = F.struct(
        *[F.col(c) for c in right_payload], F.col(ts_col).alias("__rts")
    )
    payload_type = right.select(payload_struct.alias("p")).schema["p"].dataType

    l_tagged = left.select(
        *key_cols,
        F.col(ts_col),
        F.lit(1).alias("__side"),
        *left_payload,
        F.lit(None).cast(payload_type).alias("__rpay"),
    )
    r_tagged = right.select(
        *key_cols,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        payload_struct.alias("__rpay"),
    )

    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *key_cols,
        ts_col,
        "__side",
        *left_payload,
        F.last("__rpay", ignorenulls=True).over(w).alias("__rpay"),
    )
    kept = filled.filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        if dict(kept.dtypes)[ts_col].startswith("timestamp"):
            # full-precision compare: timestampdiff(SECOND, ...) truncates
            # fractional seconds, keeping matches the exact interval
            # predicate (ts - rts <= INTERVAL n SECOND) would null out
            age = F.expr(f"timestampdiff(MICROSECOND, __rpay.__rts, {ts_col})")
            limit = int(tolerance_seconds * 1_000_000)
        else:  # numeric event-time axis
            age = F.col(ts_col) - F.col("__rpay.__rts")
            limit = tolerance_seconds
        # NULL age (no match at all) stays NULL through the when()
        kept = kept.withColumn(
            "__rpay",
            F.when(age <= limit, F.col("__rpay")).otherwise(
                F.lit(None).cast(dict(kept.dtypes)["__rpay"])
            ),
        )
    return kept.select(
        *key_cols,
        ts_col,
        *left_payload,
        *[F.col(f"__rpay.{c}").alias(c) for c in right_payload],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    right_payload: Sequence[str],
) -> DataFrame:
    """Left as-of join, FORWARD direction: every left row + the payload of
    the EARLIEST right row with ``right.ts >= left.ts`` for the same key —
    the "next quote after the order" / "first response after the alert"
    shape (DuckDB ``ASOF JOIN ... ON l.ts <= r.ts``; pandas ``merge_asof
    (direction='forward')``).

    Same single-shuffle union + window design as
    :func:`asof_join_backward`, with the scan order reversed: sorting the
    per-key partition by (ts DESC, side right-first) makes ``last(...,
    ignorenulls=True)`` carry the nearest FOLLOWING right row (the
    smallest right ts that is >= the left ts, equal ts matched). No row
    multiplication; skew handled by AQE."""
    key_cols = list(key_cols)
    left_payload = [c for c in left.columns if c not in key_cols and c != ts_col]
    payload_struct = F.struct(*[F.col(c) for c in right_payload])
    payload_type = right.select(payload_struct.alias("p")).schema["p"].dataType

    l_tagged = left.select(
        *key_cols,
        F.col(ts_col),
        F.lit(1).alias("__side"),
        *left_payload,
        F.lit(None).cast(payload_type).alias("__rpay"),
    )
    r_tagged = right.select(
        *key_cols,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        payload_struct.alias("__rpay"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # ts DESC + side ASC: at equal ts the right row (side 0) precedes the
    # left row, so an exactly-simultaneous right row IS matched.
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).desc(), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *key_cols,
        ts_col,
        "__side",
        *left_payload,
        F.last("__rpay", ignorenulls=True).over(w).alias("__rpay"),
    )
    return (
        filled.filter(F.col("__side") == 1)
        .select(
            *key_cols,
            ts_col,
            *left_payload,
            *[F.col(f"__rpay.{c}").alias(c) for c in right_payload],
        )
    )
