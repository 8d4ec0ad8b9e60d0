"""Approximate nearest-neighbor search over embedding columns.

Baseline: brute-force cosine top-k (queries/dataops.py::q_cosine_topk) —
one scan, exact. Scale path here: random-hyperplane LSH. Signatures are
16 sign-bits of hyperplane dot products (hyperplanes from a fixed seed,
embedded as plan literals — no driver state, no UDF). Candidates = rows
whose bucket is within Hamming distance ``max_hamming`` of the probe's
bucket; cosine is evaluated only on candidates.

At 100 TB the table is written ``bucketBy(bucket)`` so probing reads only
the matching buckets (partition pruning); in this repo the bucket filter
prunes compute, which is the same plan shape.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stockmarketdata_dwb_etl_spark.functions.vectors import cosine, dot

N_PLANES = 16


def hyperplanes(n_planes: int = N_PLANES, dim: int = 64, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id: sign bit of each hyperplane projection."""
    out = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        plane_lit = F.array(*[F.lit(float(x)) for x in plane])
        out = out + (dot(vec, plane_lit) >= 0).cast("bigint") * F.lit(1 << i)
    return out


def ann_cosine_topk(
    emb: DataFrame,
    probe: DataFrame,
    k: int = 10,
    max_hamming: int = 2,
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Top-k rows of ``emb`` (vec_id, label, embedding) by cosine vs the
    single-row ``probe`` (pv), scored only where the LSH buckets are within
    ``max_hamming`` bits."""
    planes = planes or hyperplanes()
    emb_b = emb.withColumn("bucket", bucket_expr(F.col("embedding"), planes))
    probe_b = probe.select(
        F.col("pv"), bucket_expr(F.col("pv"), planes).alias("pbucket")
    )
    cands = emb_b.join(F.broadcast(probe_b)).filter(
        F.bit_count(F.col("bucket").bitwiseXOR(F.col("pbucket"))) <= max_hamming
    )
    scored = cands.select(
        "vec_id",
        "label",
        F.round(cosine(F.col("embedding"), F.col("pv")), 4).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), "vec_id").limit(k)
