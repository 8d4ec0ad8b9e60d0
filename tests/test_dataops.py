"""Quality checks for the near-dup / ANN operators beyond the rows-only
contract: LSH recall vs exact ground truth, fingerprint determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_minhash_lsh_recall(spark):
    """Every injected near-dup pair (Jaccard ≥ 0.7 by construction) must be
    found by the LSH pipeline — near-identical docs collide in ≥1 band with
    overwhelming probability at 16 bands × 4 rows."""
    from stockmarketdata_dwb_etl_spark.queries.dataops2 import (
        _docs_with_near_dups,
        q_dedup_minhash,
    )

    found = q_dedup_minhash(spark, SF_DIR)
    injected = found.filter(F.col("id_b") == F.col("id_a") + 1_000_000)
    n_expected = (
        _docs_with_near_dups(spark, SF_DIR).filter(F.col("doc_id") >= 1_000_000).count()
    )
    n_found = injected.count()
    assert n_found >= 0.95 * n_expected, f"LSH recall {n_found}/{n_expected}"
    # verified jaccard must be genuinely high for the injected pairs
    assert injected.filter(F.col("jaccard") < 0.7).count() == 0


def test_simhash_finds_injected_pairs(spark):
    from stockmarketdata_dwb_etl_spark.queries.dataops2 import q_dedup_simhash

    found = q_dedup_simhash(spark, SF_DIR)
    injected = found.filter(F.col("id_b") == F.col("id_a") + 1_000_000)
    # a 3-token suffix flips few sign-votes: most injected pairs within 3 bits
    assert injected.count() > 0
    assert found.filter(F.col("hamming") > 3).count() == 0


def test_ann_recall_vs_exact(spark):
    """LSH ANN top-10 must recover most of the exact top-10 over the
    augmented set (true near-neighbors concentrate in nearby buckets)."""
    from stockmarketdata_dwb_etl_spark.functions.vectors import cosine
    from stockmarketdata_dwb_etl_spark.queries.dataops2 import (
        _embeddings_with_near_probe,
    )
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all

    load_all()
    emb = _embeddings_with_near_probe(spark, SF_DIR)
    probe = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("pv"))
    exact_df = (
        emb.filter(F.col("vec_id") != 0)
        .join(F.broadcast(probe))
        .select(
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("pv")), 4).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
    )
    exact = {r.vec_id for r in exact_df.collect()}
    approx = {r.vec_id for r in QUERIES["q_ann_cosine_topk"](spark, SF_DIR).collect()}
    assert len(exact & approx) >= 8, f"ANN recall too low: {exact & approx}"


def test_multimodal_features_deterministic(spark):
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all

    load_all()
    a = QUERIES["q_multimodal_features"](spark, SF_DIR).orderBy("doc_id").collect()
    b = QUERIES["q_multimodal_features"](spark, SF_DIR).orderBy("doc_id").collect()
    assert a == b
    assert all(0.0 <= r.f0 <= 1.0 for r in a)


def test_frame_sampling_lossless(spark):
    """4 frames per video doc; concatenated frames == original payload."""
    from stockmarketdata_dwb_etl_spark.sources.multimodal import (
        build_media_table,
        sample_frames,
    )

    media = build_media_table(spark, SF_DIR).filter(F.col("media_type") == "video")
    frames = sample_frames(media)
    n_docs = media.count()
    assert frames.count() == 4 * n_docs
    joined = (
        frames.groupBy("doc_id")
        .agg(
            F.concat_ws(
                "", F.transform(F.array_sort(F.collect_list(F.struct("frame_idx", "frame"))), lambda s: s.getField("frame").cast("string"))
            ).alias("reassembled")
        )
        .join(media.select("doc_id", F.col("payload").cast("string").alias("orig")), "doc_id")
    )
    assert joined.filter(F.col("reassembled") != F.col("orig")).count() == 0


def test_multimodal_resize_uniform_and_deterministic(spark):
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all

    load_all()
    a = QUERIES["q_multimodal_resize"](spark, SF_DIR).collect()
    b = QUERIES["q_multimodal_resize"](spark, SF_DIR).collect()
    assert [r.resized_md5 for r in a] == [r.resized_md5 for r in b]
    assert a and all(r.resized_bytes == 64 for r in a)
    # downsampled payloads keep first byte; padded ones repeat content
    assert all(r.orig_bytes > 0 for r in a)


def test_lsh_cross_candidates_cross_only_and_capped(spark):
    """lsh_cross_candidate_pairs generates ONLY cross-side pairs, and the
    probe-side bucket cap bounds per-bucket fan-out: with every doc
    identical (all ids share every band bucket), pairs per bucket =
    corpus_members x min(probe_members, cap)."""
    from stockmarketdata_dwb_etl_spark.operators.dedup import (
        lsh_cross_candidate_pairs,
        minhash_signatures,
    )

    # 20 identical docs: ids 0..19, probe side = even ids
    docs = spark.range(20).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma delta epsilon zeta eta theta").alias("text"),
    )
    sigs = minhash_signatures(docs)
    is_probe = lambda c: c % 2 == 0  # noqa: E731

    uncapped = lsh_cross_candidate_pairs(sigs, is_probe).collect()
    # all pairs cross-side, ordered id_a < id_b
    for r in uncapped:
        assert (r.id_a % 2 == 0) != (r.id_b % 2 == 0)
        assert r.id_a < r.id_b
    assert len(uncapped) == 10 * 10  # full cross of 10 corpus x 10 probe

    capped = lsh_cross_candidate_pairs(
        sigs, is_probe, max_probe_per_bucket=3
    ).collect()
    # deterministic cap: the 3 LOWEST probe ids (0,2,4) survive
    probe_ids = {x for r in capped for x in (r.id_a, r.id_b) if x % 2 == 0}
    assert probe_ids == {0, 2, 4}
    assert len(capped) == 10 * 3
