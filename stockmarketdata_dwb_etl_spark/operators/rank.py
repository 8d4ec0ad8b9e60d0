"""Scale-safe global ranking: distributed total-order row numbering.

A global ``Window.orderBy(...)`` (no partitionBy) collapses the whole
input into ONE reducer — the classic scale-killer for percentile /
ntile / percent_rank assignment over a fact table. This operator computes
the identical total-order row number with no single-reducer stage:

1. ``repartitionByRange(order_cols)`` — the same range shuffle a global
   sort pays; each partition now owns a contiguous, disjoint key range.
2. local ``row_number`` per range partition — embarrassingly parallel.
3. per-partition row counts → cumulative offsets. The offset table has
   ONE ROW PER PARTITION (a few hundred at cluster scale), so the
   cumulative window over it is a trivially small single-reducer step —
   coordination over P rows, never over the data.
4. global index = partition offset + local index, via a broadcast join
   on the partition id.

Wall-clock at 100 TB: one range shuffle + one map pass — the same cost
profile as ``df.orderBy(...).write``, vs. the unpartitioned window's
one-task sort of the entire table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_row_number(
    df: DataFrame,
    order_cols: list[str | Column],
    out: str = "row_idx",
    n_total: str | None = "n_total",
) -> DataFrame:
    """Add 1-based ``out`` = row number over the TOTAL order ``order_cols``
    (which must be a unique ordering — the repo-wide every-orderBy-gets-a-
    unique-tie-break policy makes results deterministic), plus optionally
    ``n_total`` = total row count, without any full-data single-reducer
    stage. Equivalent to ``row_number().over(Window.orderBy(*order_cols))``.

    The ranged input is localCheckpoint'ed so the two consumers (count
    branch and rank branch) see the SAME range split even if Spark decides
    not to reuse the exchange — range boundaries come from sampling, so
    recomputing them independently per branch could misalign offsets.
    """
    ranged = (
        df.repartitionByRange(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )

    counts = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    # cumulative offsets over ONE ROW PER PARTITION — the only global
    # window in the plan, sized P (partitions), not N (rows)
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    w_tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__offset"),
        F.sum("__cnt").over(w_tot).alias("__n_total"),
    )

    w_local = Window.partitionBy("__pid").orderBy(*order_cols)
    ranked = (
        ranged.withColumn("__local", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(out, F.col("__offset") + F.col("__local"))
    )
    keep = [F.col(out)]
    if n_total:
        keep.append(F.col("__n_total").alias(n_total))
    return ranked.select(*df.columns, *keep)


def global_prefix_sum(
    df: DataFrame,
    value_col: str | Column,
    order_cols: list[str | Column],
    out: str = "prefix_sum",
) -> DataFrame:
    """Add ``out`` = EXCLUSIVE prefix sum of ``value_col`` over the TOTAL
    order ``order_cols`` (unique ordering required), with no full-data
    single-reducer stage. Equivalent to
    ``sum(value).over(Window.orderBy(*order_cols).rowsBetween(unboundedPreceding, -1))``
    (0 for the first row), but built the same scale-safe way as
    :func:`global_row_number`: range shuffle → local running sum →
    per-partition totals (P rows) → broadcast offsets.

    This is the operator behind sequence packing: concatenate documents in
    a deterministic order and every document's global token offset is its
    exclusive prefix sum."""
    vcol = F.col(value_col) if isinstance(value_col, str) else value_col
    ranged = (
        df.repartitionByRange(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__v", vcol.cast("bigint"))
        .localCheckpoint(eager=True)
    )

    totals = ranged.groupBy("__pid").agg(F.sum("__v").alias("__ptot"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid", F.coalesce(F.sum("__ptot").over(w_off), F.lit(0)).alias("__offset")
    )

    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    summed = (
        ranged.withColumn("__local", F.coalesce(F.sum("__v").over(w_local), F.lit(0)))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(out, F.col("__offset") + F.col("__local"))
    )
    return summed.select(*df.columns, F.col(out))


def ntile_expr(row_idx: Column, n_total: Column, k: int) -> Column:
    """SQL NTILE(k) from a 1-based total-order row number: the first
    ``n mod k`` buckets take ``ceil(n/k)`` rows, the rest ``floor(n/k)``."""
    q = (n_total / k).cast("bigint")  # floor: both sides positive
    r = n_total % k
    big = (q + 1) * r  # rows covered by the larger buckets
    return (
        F.when(row_idx <= big, ((row_idx - 1) / (q + 1)).cast("bigint"))
        .otherwise(r + ((row_idx - big - 1) / F.greatest(q, F.lit(1))).cast("bigint"))
        + 1
    )


def percent_rank_expr(row_idx: Column, n_total: Column) -> Column:
    """SQL percent_rank over a unique total order: (rank-1)/(n-1), 0 when
    n = 1 (ties impossible by the unique-order contract, so rank ==
    row_number)."""
    return F.when(n_total == 1, F.lit(0.0)).otherwise(
        (row_idx - 1) / (n_total - 1)
    )


def cume_dist_expr(row_idx: Column, n_total: Column) -> Column:
    """SQL cume_dist over a unique total order: rank/n."""
    return row_idx / n_total
