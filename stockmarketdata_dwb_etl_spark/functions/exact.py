"""Deterministic floating aggregates for the differential-oracle contract.

Summing doubles is order-dependent; at 100 TB a partial-aggregation tree in
Spark and a single-threaded DuckDB scan WILL disagree beyond 4 decimals on
billion-scale sums. Policy (SURVEY.md §2B determinism): per-row arithmetic
stays in double (bit-identical across engines), then the value is cast to
DECIMAL for the exact, order-independent summation, rounded to 4 decimals,
and cast back to double. The matching oracle-side SQL fragments are provided
by :func:`sql_exact_sum` / :func:`sql_exact_avg`.

This costs one decimal conversion per row in exchange for scale-independent
determinism — a deliberate trade the engine only makes in the oracle-checked
query surface; interactive pipelines are free to use plain double aggs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 38 total digits, 6 fractional: holds sums over ~1e13 rows of ~1e12-scale
# values without overflow while keeping sub-cent precision.
_DEC = "decimal(38,6)"


def exact_sum(col: Column, alias: str) -> Column:
    """Order-independent SUM: exact decimal accumulation, round 4, double."""
    return F.round(F.sum(col.cast(_DEC)), 4).cast("double").alias(alias)


def exact_avg(col: Column, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum, cast to double, then a
    single double division — the identical op order as the oracle fragment,
    so both engines produce the same bits before the 4-dp round."""
    return (
        F.round(F.sum(col.cast(_DEC)).cast("double") / F.count(col), 4)
        .cast("double")
        .alias(alias)
    )


def sql_exact_sum(expr: str, alias: str) -> str:
    """DuckDB fragment equivalent to :func:`exact_sum`."""
    return f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(38,6))), 4) AS DOUBLE) AS {alias}"


def sql_exact_avg(expr: str, alias: str) -> str:
    """DuckDB fragment equivalent to :func:`exact_avg`."""
    return (
        f"CAST(ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"
        f" / COUNT({expr}), 4) AS DOUBLE) AS {alias}"
    )


def portable_round(col: Column | str, ndigits: int = 0) -> Column:
    """Half-boundary-portable ROUND for doubles built from an IDENTICAL
    expression tree on both engines.

    Engine-native ROUND(double, n) disagrees exactly at half boundaries:
    Spark rounds the shortest-decimal representation (BigDecimal
    HALF_UP), DuckDB rounds the scaled double — a value landing on
    x.xxx5 can flip the last digit differently per engine (observed at
    sf0.1 on the stochastic oscillator: 35.74135 -> 35.7414 vs
    35.7413). ``floor(x·10^n + 0.5)/10^n`` uses only bit-deterministic
    double ops, so identical input bits give the identical rounded
    double on BOTH engines — pair it with :func:`sql_portable_round`.
    Half-up for positive values (floor(+0.5) rounds halves toward +inf;
    use only where sign is known or either direction is acceptable —
    what matters for the differential is that both engines agree)."""
    if isinstance(col, str):
        col = F.col(col)
    scale = float(10**ndigits)
    return (
        F.floor(col.cast("double") * F.lit(scale) + F.lit(0.5)).cast("double")
        / F.lit(scale)
    )


def sql_portable_round(expr: str, ndigits: int) -> str:
    """DuckDB fragment equivalent to :func:`portable_round`."""
    scale = float(10**ndigits)
    return f"(CAST(floor(CAST(({expr}) AS DOUBLE) * {scale} + 0.5) AS DOUBLE) / {scale})"


def sql_term_sum(expr: str, ndigits: int = 12) -> str:
    """Order-independent oracle Σ over per-row double terms: round each
    term with the portable floor form (identical double tree on both
    engines), accumulate in exact DECIMAL(38,18), emit DOUBLE.

    A plain double SUM is accumulation-order dependent — DuckDB's
    scan-order sum vs Spark's partial-aggregation tree (or in-array
    fold) can differ by an ulp, enough to flip a later rounded
    threshold/argmin decision. The rounded-DECIMAL Σ is bit-identical
    however the rows arrive. ndigits must keep |term|·10^n < 2^53
    ≈ 9.0e15 — NOT merely under the int64 9.2e18 floor-saturation
    bound: once k = round(|term|·10^n) exceeds 2^53, the double k/10^n
    no longer round-trips through ≤17 significant digits, so Spark's
    shortest-repr double→DECIMAL and DuckDB's float-scaled conversion
    produce DIFFERENT approximations (observed round 11: q_anova_hod
    s_g ~1e6-scale terms at 12dp flipped an 8dp output round). 12dp
    therefore holds to |term| < ~9e3; for wider dynamic ranges use a
    two-bucket split sum (stats_q._ssum2/_dsum2). The cast scale equals the
    rounding digits: a rounded k/10^n converts exactly at scale n on
    both engines, while DuckDB's double→DECIMAL(38,18) goes through
    float scaling and mangles sub-precision digits (the q_levene_bf
    sf0.1 divergence)."""
    return (
        f"CAST(SUM(CAST({sql_portable_round(expr, ndigits)}"
        f" AS DECIMAL(38,{ndigits}))) AS DOUBLE)"
    )


def fold_term_sum(arr: Column, ndigits: int = 12) -> Column:
    """Spark twin of :func:`sql_term_sum` for in-array folds (zip_with /
    transform products): round each element, fold in exact DECIMAL,
    emit DOUBLE. Precision 28 (NOT 38) is load-bearing: (28,n)+(28,n)
    promotes to (29,n), under Spark's 38 cap, so every fold step is
    EXACT; at precision 38 the addition overflows to 39 and Spark
    silently REDUCES the result scale to n-1, half-up-rounding every
    step while DuckDB's list_sum stays exact (observed as a +29e-10
    drift on q_cci's 20-element frames at scale 10). The cast back on
    the lambda result re-closes the accumulator type; it never rounds
    because the scale is preserved and |acc| stays far below
    10^(28-n) for every rounded-term fold in the repo."""
    dec = f"decimal(28,{ndigits})"
    return F.aggregate(
        arr,
        F.lit(0).cast(dec),
        lambda acc, x: (acc + portable_round(x, ndigits).cast(dec)).cast(dec),
    ).cast("double")
