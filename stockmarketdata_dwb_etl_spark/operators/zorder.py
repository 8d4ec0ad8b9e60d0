"""Z-order (Morton-curve) clustering: multi-dimensional data layout for
min/max file skipping.

A 100 TB table sorted on ONE column prunes scans on that column only; a
box predicate over two columns still reads every file for the second
dimension. Interleaving the bits of both columns' bucket ids produces a
1-D sort key (the Morton / Z curve) along which EVERY interleaved
dimension clusters, so parquet footer min/max stats — which Spark and
every lakehouse reader consult — skip files for predicates on any subset
of the z-ordered columns. This is the engine-native form of
Delta/Iceberg `OPTIMIZE ZORDER BY`.

Pipeline: per-column linear bucketization to `bits`-wide ids (min/max from
one broadcast 1-row aggregate — a sketch, not a collect), bit interleave
(compile-time-unrolled shift/or JVM expressions: `bits × ncols` terms,
fully inside WholeStageCodegen), then `repartitionByRange` on the z-value
+ `sortWithinPartitions` so each output file owns a compact z-range.

Linear bucketization is skew-sensitive (a heavy hitter collapses buckets);
for skewed layout keys substitute rank-based ids from
operators/rank.py::global_row_number — the interleave is agnostic to how
the bucket ids were made.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension; 2 dims × 16 bits = 32-bit z-values in a bigint.
Z_BITS = 16


def _bucket(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Linear [min,max] → [0, 2^bits-1] bucket id (clamped, null→0)."""
    span = F.when(cmax != cmin, (cmax - cmin).cast("double")).otherwise(F.lit(1.0))
    frac = (col.cast("double") - cmin.cast("double")) / span
    scaled = F.floor(frac * ((1 << bits) - 1)).cast("long")
    return F.greatest(
        F.lit(0).cast("long"),
        F.least(F.lit((1 << bits) - 1).cast("long"), F.coalesce(scaled, F.lit(0))),
    )


def zvalue(bucket_ids: list[Column], bits: int = Z_BITS) -> Column:
    """Interleave the low `bits` of each bucket id into one Morton code.

    Unrolled at plan-build time: literal shift counts keep every term in
    the Python-API fast path and the whole expression in codegen.
    """
    n = len(bucket_ids)
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(bucket_ids):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return out


def zorder_write(
    df: DataFrame, cols: list[str], path: str, n_files: int, bits: int = Z_BITS
) -> None:
    """Rewrite `df` as `n_files` parquet files clustered along the z-curve
    of `cols`. One stats pass (broadcast 1-row min/max agg), one range
    shuffle — the standard table-maintenance cost, amortized over every
    subsequent pruned scan."""
    stats = df.agg(
        *[F.min(c).alias(f"__min_{c}") for c in cols],
        *[F.max(c).alias(f"__max_{c}") for c in cols],
    )
    with_z = df.join(F.broadcast(stats)).withColumn(
        "__z",
        zvalue(
            [
                _bucket(F.col(c), F.col(f"__min_{c}"), F.col(f"__max_{c}"), bits)
                for c in cols
            ],
            bits,
        ),
    ).drop(*[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])
    (
        with_z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
