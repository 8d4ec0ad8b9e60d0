"""Vector math over ArrayType columns — JVM-side higher-order functions.

No UDF, no collect: ``zip_with`` + ``aggregate`` compile to Catalyst
expressions that run inside codegen, so cosine/top-k scans stay columnar
and distribute like any projection. Elements are cast to double before
accumulating so float32 inputs accumulate in double (matches the DuckDB
oracle casting the list to DOUBLE[]).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ accumulated in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    """Euclidean norm, accumulated in double."""
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either side has zero norm."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def spread_rows(df):
    """Round-robin repartition applied ONLY when the input arrives in
    fewer partitions than the session's parallelism. A small parquet
    fixture lands in 1-2 splits, which pins a CPU-bound per-row fan
    (d² pair products, array folds) to 1-2 cores — measured 12.6 s →
    1.4 s for the effective-rank pair aggregation at sf0.1/local[32].
    At 100 TB the scan's own splits already provide the parallelism, so
    the branch inserts NO exchange there (decided at plan-build time,
    not a constant tuned to either mode).

    Probe semantics: ``df.rdd.getNumPartitions()`` reads the PRE-AQE
    physical partition count — for a leaf parquet scan that is the real
    split count; for a post-shuffle input it reads the configured
    shuffle-partition count (== defaultParallelism in this repo's
    session), so the branch correctly no-ops there too. The ``.rdd``
    probe costs one extra driver-side planning pass per query build —
    microseconds against the stage it protects; never a job."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def dim_pair_products(df, vec_col: str = "v", id_cols: tuple = ()):
    """(ia, ib, prod) rows for EVERY ordered dimension pair of an
    array<double> column, generated MAP-SIDE from each row's own array
    — the q_pair_affinity design applied to dimension pairs.

    Replaces the exploded-table self-join (ex ⋈ ex ON vec_id) that
    q_whitening_stats/q_cka_alignment/q_effective_rank first shipped:
    the join shuffles 2·d·n exploded rows on the vector id before
    producing the d²·n pair rows, while this form produces them in the
    scan's own task and lets the downstream groupBy(ia, ib) partial-
    aggregate them down to d² rows per partition BEFORE its shuffle —
    at 100 TB the only exchange left is the d²-key final agg. The
    caller filters pairs (ia < ib, block masks) map-side and applies
    its own rounding discipline to ``prod``.

    The input is :func:`spread_rows`-spread first: the d² fan
    multiplies each row's work 4096×, so partition starvation on a
    small scan dominates the stage (see spread_rows)."""
    df = spread_rows(df)
    vec = F.col(vec_col)
    d = F.size(vec)
    pair = F.explode(
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), d),
                lambda i: F.transform(
                    F.sequence(F.lit(1), d),
                    lambda j: F.struct(
                        i.alias("ia"),
                        j.alias("ib"),
                        (F.element_at(vec, i) * F.element_at(vec, j)).alias(
                            "prod"
                        ),
                    ),
                ),
            )
        )
    ).alias("p")
    return df.select(*id_cols, pair).select(
        *id_cols, "p.ia", "p.ib", "p.prod"
    )
