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
