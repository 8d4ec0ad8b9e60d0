"""Round-10 operator semantics: the dataops11 entity-resolution /
corpus-statistics additions — properties the differential oracle can't
express (bounds, invariances, recomputation against raw data), pinned
at sf0.001."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from stockmarketdata_dwb_etl_spark.catalog import load_table
from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all
from tests.conftest import SF_DIR

load_all()


def test_record_linkage_weights_monotone_in_agreement(spark):
    """More agreeing fields can only raise the Fellegi–Sunter weight
    when each field's m > u (true here by construction): flipping any
    single bit from 0→1 must increase weight_bits. Also: all-ones is
    the max-weight pattern, and match purity rises with weight."""
    out = (
        QUERIES["q_record_linkage"](spark, SF_DIR)
        .toPandas()
        .set_index("pattern")
    )
    w = out.weight_bits.to_dict()
    for p, wp in w.items():
        for bit in (1, 2, 4):
            if not p & bit and (p | bit) in w:
                assert w[p | bit] > wp, (p, bit, w)
    assert max(w) == 7 or w[max(w)] == max(w.values())
    assert w[max(w, key=lambda k: w[k])] == max(w.values())
    # purity: the all-agree pattern is (near-)pure matches, the
    # no-agree pattern is match-poor
    if 7 in out.index:
        assert out.loc[7, "n_matches"] == out.loc[7, "n_pairs"]
    if 0 in out.index and 7 in out.index:
        # purity rises with agreement (relative claim — at sf0.001 the
        # no-agree pattern holds a handful of pairs, so an absolute
        # match-poor bound would be fixture noise)
        assert (
            out.loc[0, "n_matches"] / out.loc[0, "n_pairs"]
            <= out.loc[7, "n_matches"] / out.loc[7, "n_pairs"]
        )


def test_record_linkage_match_totals(spark):
    """Σ n_matches over patterns = twin pairs retained by blocking =
    q_blocking_quality's n_true_in_cand; pairs are consistent too."""
    rl = QUERIES["q_record_linkage"](spark, SF_DIR).toPandas()
    bq = QUERIES["q_blocking_quality"](spark, SF_DIR).toPandas().iloc[0]
    assert rl.n_matches.sum() == bq.n_true_in_cand
    assert rl.n_pairs.sum() == bq.n_cand_pairs


def test_blocking_quality_bounds_and_truth(spark):
    """Reduction ratio in (0,1); completeness in (0,1]; true pairs =
    one per 10th customer recomputed from the raw table."""
    out = QUERIES["q_blocking_quality"](spark, SF_DIR).toPandas().iloc[0]
    cust = load_table(spark, SF_DIR, "customer")
    n_cust = cust.count()
    n_twins = cust.filter(F.col("c_custkey") % 10 == 0).count()
    assert out.n_records == n_cust + n_twins
    assert out.n_true_pairs == n_twins
    assert 0 < out.reduction_ratio < 1
    assert 0 < out.pairs_completeness <= 1
    assert out.n_true_in_cand <= out.n_true_pairs
    assert out.n_cand_pairs < out.n_records * (out.n_records - 1) / 2


def test_zipf_fit_recompute(spark):
    """Slope/intercept recomputed in pure python from raw token
    frequencies must agree to the emitted 6dp rounding."""
    out = QUERIES["q_zipf_fit"](spark, SF_DIR).toPandas().iloc[0]
    docs = load_table(spark, SF_DIR, "documents").toPandas()
    freq: dict[str, int] = {}
    for t in docs.text:
        for tok in t.split(" "):
            if tok:
                freq[tok] = freq.get(tok, 0) + 1
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:10000]
    xs = [math.log10(r + 1) for r in range(len(ranked))]
    ys = [math.log10(f) for _, f in ranked]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert out.n_vocab == n
    assert abs(out.zipf_slope - slope) < 1e-4
    assert out.zipf_slope < 0  # frequency falls with rank
    assert 0 <= out.r2 <= 1


def test_heaps_law_recompute(spark):
    """β recomputed from a sequential pandas scan (cumulative tokens vs
    cumulative vocabulary in doc_id order) must match to 6dp scale;
    vocabulary growth exponent lies in [0, 1]."""
    out = QUERIES["q_heaps_law"](spark, SF_DIR).toPandas().iloc[0]
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .toPandas()
        .sort_values("doc_id")
    )
    seen: set[str] = set()
    pts = []
    n_cum = 0
    for t in docs.text:
        toks = [w for w in t.split(" ") if w]
        n_cum += len(toks)
        seen.update(toks)
        if n_cum > 0 and seen:
            pts.append((math.log10(n_cum), math.log10(len(seen))))
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert out.n_docs == n
    assert abs(out.heaps_beta - beta) < 1e-4
    assert 0 <= out.heaps_beta <= 1
    assert out.heaps_k > 0


def test_group_kfold_no_source_straddles_folds(spark):
    """The defining property: fold is a function of source, so the
    distinct-source counts across folds must sum to the corpus's
    distinct sources (no source counted in two folds), and every doc is
    in exactly one fold; token shares sum to 1."""
    out = QUERIES["q_group_kfold"](spark, SF_DIR).toPandas()
    docs = load_table(spark, SF_DIR, "documents")
    assert out.n_docs.sum() == docs.count()
    assert out.n_sources.sum() == docs.select("source").distinct().count()
    assert abs(out.token_share.sum() - 1.0) < 1e-6
    assert set(out.fold) <= {0, 1, 2, 3, 4}


def test_negative_sampling_deterministic_and_valid(spark):
    """Draws recomputed with hashlib must match exactly; no draw equals
    its anchor or positive; every neg_id is a real document."""
    out = QUERIES["q_negative_sampling"](spark, SF_DIR).toPandas()
    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    ids = set(range(n_docs))
    assert set(out.neg_id) <= ids
    assert (out.neg_id != out.anchor_id).all()
    assert (out.neg_id != out.pos_id).all()
    for _, row in out.iterrows():
        h = hashlib.md5(
            f"{row.anchor_id}:{row.draw_idx}".encode()
        ).hexdigest()
        assert row.neg_id == int(h[:8], 16) % n_docs
        assert row.pos_id == (row.anchor_id + 1) % n_docs
    # anchors with all 4 draws valid appear 4 times
    assert (out.groupby("anchor_id").size() <= 4).all()
