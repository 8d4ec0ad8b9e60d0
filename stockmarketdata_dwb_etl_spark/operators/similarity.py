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
from stockmarketdata_dwb_etl_spark.functions.exact import portable_round

from stockmarketdata_dwb_etl_spark.functions.vectors import cosine, dot

N_PLANES = 16


def hyperplanes(n_planes: int = N_PLANES, dim: int = 64, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id: sign bit of each hyperplane projection.

    The plane matrix enters the plan as ONE array<array<double>> Literal
    and the bits fold in a single runtime ``aggregate`` (Horner form,
    high plane first, so plane 0 lands at bit 0) — the previous
    unrolled form inlined 32 plane arrays × 64 CreateArray literal
    nodes into the expression tree, and analysis + codegen of that
    ~2000-node projection dominated the whole LSH query (measured
    1.9 s -> 1.1 s warm, 5.1 s -> 1.2 s cold on the sf0.01 signature
    scan; bit-identical bucket ids)."""
    rev = F.lit([[float(x) for x in p] for p in reversed(planes)])
    return F.aggregate(
        rev,
        F.lit(0).cast("bigint"),
        lambda acc, p: acc * F.lit(2).cast("bigint")
        + (dot(vec, p) >= F.lit(0.0)).cast("bigint"),
    )


def ivf_cosine_topk(
    emb: DataFrame,
    probe: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style ANN: partition vectors into inverted-file cells, probe only
    the cells nearest the query.

    Cells are the ``n_cells`` lowest-``vec_id`` vectors (deterministic
    seeds — a k-means refinement would only move the centroids, not the
    plan). Every vector is assigned to its max-cosine cell (one broadcast
    nested-loop over the tiny centroid table + a per-vector argmax, no
    shuffle of the big side); the probe scores the same centroid table and
    scans only its ``n_probe`` best cells.

    At 100 TB the assigned table is written ``partitionBy(cell_id)`` so a
    probe reads n_probe/n_cells of the data (partition pruning); here the
    cell filter prunes compute with the identical plan shape. No collect,
    no shuffle of the big side: assignment is a map-side argmax over a
    broadcast 1-row centroid array.
    """
    cents = (
        emb.filter(F.col("vec_id") < n_cells)
        .select(
            F.struct(
                F.col("vec_id").alias("cell_id"), F.col("embedding").alias("cv")
            ).alias("c")
        )
        .agg(F.array_sort(F.collect_list("c")).alias("cents"))
    )

    def argmax_cell(vec):
        init = F.struct(
            F.lit(-2.0).cast("double").alias("s"), F.lit(-1).cast("bigint").alias("c")
        )
        step = lambda acc, ct: F.when(  # noqa: E731
            cosine(vec, ct.getField("cv")) > acc.getField("s"),
            F.struct(
                cosine(vec, ct.getField("cv")).alias("s"),
                ct.getField("cell_id").alias("c"),
            ),
        ).otherwise(acc)
        return F.aggregate(F.col("cents"), init, step).getField("c")

    assigned = (
        emb.join(F.broadcast(cents))
        .withColumn("cell_id", argmax_cell(F.col("embedding")))
        .select("vec_id", "label", "embedding", "cell_id")
    )

    probe_cells = (
        probe.join(F.broadcast(cents))
        .select("pv", F.explode("cents").alias("c"))
        .select(
            "pv",
            F.col("c.cell_id").alias("cell_id"),
            cosine(F.col("pv"), F.col("c.cv")).alias("s"),
        )
        .orderBy(F.col("s").desc(), "cell_id")
        .limit(n_probe)
        .select("pv", "cell_id")
    )
    cands = assigned.join(F.broadcast(probe_cells), "cell_id")
    scored = cands.select(
        "vec_id",
        "label",
        portable_round(cosine(F.col("embedding"), F.col("pv")), 4).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), "vec_id").limit(k)


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
        portable_round(cosine(F.col("embedding"), F.col("pv")), 4).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), "vec_id").limit(k)


def write_ivf_index(
    emb: DataFrame, path: str, n_cells: int = 16
) -> None:
    """Materialize the IVF index: vectors assigned to cells (same map-side
    argmax as :func:`ivf_cosine_topk`) written ``partitionBy(cell_id)`` —
    at 100 TB a probe then READS only n_probe/n_cells of the bytes
    (directory-level partition pruning), not just computes less."""
    cents = (
        emb.filter(F.col("vec_id") < n_cells)
        .select(
            F.struct(
                F.col("vec_id").alias("cell_id"), F.col("embedding").alias("cv")
            ).alias("c")
        )
        .agg(F.array_sort(F.collect_list("c")).alias("cents"))
    )
    init = F.struct(
        F.lit(-2.0).cast("double").alias("s"), F.lit(-1).cast("bigint").alias("c")
    )
    step = lambda acc, ct: F.when(  # noqa: E731
        cosine(F.col("embedding"), ct.getField("cv")) > acc.getField("s"),
        F.struct(
            cosine(F.col("embedding"), ct.getField("cv")).alias("s"),
            ct.getField("cell_id").alias("c"),
        ),
    ).otherwise(acc)
    assigned = (
        emb.join(F.broadcast(cents))
        .withColumn("cell_id", F.aggregate(F.col("cents"), init, step).getField("c"))
        .select("vec_id", "label", "embedding", "cell_id")
    )
    assigned.write.mode("overwrite").partitionBy("cell_id").parquet(path)


def ivf_probe_index(
    spark, path: str, probe: DataFrame, k: int = 10, n_cells: int = 16, n_probe: int = 4
) -> DataFrame:
    """Top-k by cosine over a materialized IVF index: the probe's best
    ``n_probe`` cells are computed from the index's own cell seeds and
    joined against the partitioned table — dynamic partition pruning keeps
    the scan to those cells' directories."""
    idx = spark.read.parquet(path)
    cents = (
        idx.filter(F.col("vec_id") < n_cells)
        .select(F.col("vec_id").alias("cell_id"), F.col("embedding").alias("cv"))
    )
    probe_cells = (
        probe.join(F.broadcast(cents))
        .select("pv", "cell_id", cosine(F.col("pv"), F.col("cv")).alias("s"))
        .orderBy(F.col("s").desc(), "cell_id")
        .limit(n_probe)
        .select("pv", "cell_id")
    )
    cands = idx.join(F.broadcast(probe_cells), "cell_id")
    scored = cands.select(
        "vec_id",
        "label",
        portable_round(cosine(F.col("embedding"), F.col("pv")), 4).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), "vec_id").limit(k)


def probe_pool_candidates(
    probes: DataFrame,
    pool: DataFrame,
    probe_id: str = "ip",
    pool_id: str = "iq",
    probe_vec: str = "vp",
    pool_vec: str = "vq",
    brute_force_limit: int = 200_000,
    n_planes: int = 32,
    n_bands: int = 4,
    seed: int = 7,
    max_bucket: int = 2000,
) -> DataFrame:
    """Candidate (probe, pool) rows for the multi-probe kNN audits
    (q_label_noise_knn's neighbor vote, q_intrinsic_dim's TwoNN ratio):
    the EXACT probes×pool grid while the pool fits under
    ``brute_force_limit`` rows, and banded hyperplane-LSH bucket
    candidates above it — the executable form of the q_mutual_knn
    "sample-bounded, LSH at corpus scale" contract, so a caller can no
    longer hit an O(|probes|·N) nested-loop join on a 100 TB pool by
    accident.

    LSH path (the :func:`~stockmarketdata_dwb_etl_spark.operators.dedup
    .embedding_near_dups` band shape, cross-side): both sides take
    ``n_planes`` sign bits on the same fixed-seed hyperplanes, split
    into ``n_bands`` bands, and candidates equi-join on
    (band_id, band_val) — shuffling only (id, band) rows, never the
    vectors, never all pairs. Pool-side buckets above ``max_bucket``
    rows are dropped so one degenerate dense region can't recreate the
    quadratic join this path exists to avoid (the repo-wide LSH cap
    discipline). Candidates are id-only until the final join-back of
    both sides' full rows, and the output schema matches the
    brute-force grid exactly — downstream rank/vote logic is
    path-independent. Above the threshold the audit is explicitly
    approximate: per-band recall for a cos≈0.9 true neighbor is
    ~1-(1-(1-θ/π)^(planes/bands))^bands ≈ 0.74 at the defaults, the
    standard LSH recall/cost dial (raise n_bands to trade shuffle
    volume for recall)."""
    # The strategy DECISION must not itself scan the pool (r12 verdict:
    # a bare pool.count() is a full action over a 100 TB pool per query
    # call). Only "is the pool over the limit?" matters, so count a
    # LIMIT-bounded prefix: CollectLimit short-circuits after
    # brute_force_limit+1 rows, reading partitions incrementally — the
    # decision job's cost is bounded by the limit, never by |pool|.
    if pool.limit(brute_force_limit + 1).count() <= brute_force_limit:
        from stockmarketdata_dwb_etl_spark.functions.vectors import (
            spread_rows,
        )

        # the nested-loop join parallelizes over the STREAMED (pool)
        # side's partitions; a sub-limit pool read from a small parquet
        # fixture arrives in 1-2 splits and would pin the |probes|
        # distance folds per pool row to 1-2 cores (measured 12.7 s →
        # ~1 s for q_label_noise_knn at sf0.1/local[32]). No-op when
        # the scan already has ≥ parallelism splits.
        return probes.join(spread_rows(pool), F.col(probe_id) != F.col(pool_id))

    planes = hyperplanes(n_planes=n_planes, seed=seed)
    bits = n_planes // n_bands

    def _bands(df: DataFrame, idc: str, vc: str) -> DataFrame:
        return df.select(
            F.col(idc),
            bucket_expr(F.col(vc), planes).alias("__sig"),
        ).select(
            F.col(idc),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("band_id"),
                            F.shiftright("__sig", j * bits)
                            .bitwiseAND(F.lit((1 << bits) - 1))
                            .alias("band_val"),
                        )
                        for j in range(n_bands)
                    ]
                )
            ).alias("b"),
        ).select(idc, "b.band_id", "b.band_val")

    pband = _bands(probes, probe_id, probe_vec)
    qband = _bands(pool, pool_id, pool_vec)
    qcap = (
        qband.groupBy("band_id", "band_val")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") <= max_bucket)
        .select("band_id", "band_val")
    )
    pairs = (
        pband.join(qband.join(qcap, ["band_id", "band_val"]),
                   ["band_id", "band_val"])
        .filter(F.col(probe_id) != F.col(pool_id))
        .select(probe_id, pool_id)
        .distinct()
    )
    return pairs.join(probes, probe_id).join(pool, pool_id)
