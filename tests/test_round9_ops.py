"""Round-9 operator semantics: the dataops10 LLM-pipeline additions —
properties the differential oracle can't express (bounds, invariances,
recomputation against raw data), pinned at sf0.001."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all
from tests.conftest import SF_DIR

load_all()


def test_rrf_fusion_scores_bounded_and_sorted(spark):
    """RRF = Σ 1/(60+rank) over ≤2 lists with rank ≥ 1, so every score
    sits in (0, 2/61]; output is the top-20 by (score desc, doc_id),
    and every emitted rank is within its top-100 list."""
    out = QUERIES["q_rrf_fusion"](spark, SF_DIR).toPandas()
    assert 0 < len(out) <= 20
    assert (out.rrf_score > 0).all()
    assert (out.rrf_score <= 2.0 / 61 + 1e-12).all()
    assert (
        out.sort_values(
            ["rrf_score", "doc_id"], ascending=[False, True]
        ).doc_id.tolist()
        == out.doc_id.tolist()
    )
    for col in ("r_lex", "r_sem"):
        ranks = out[col].dropna()
        assert ((ranks >= 1) & (ranks <= 100)).all()
    # a fused row must come from at least one list
    assert (~(out.r_lex.isna() & out.r_sem.isna())).all()


def test_rrf_fusion_two_list_docs_beat_singletons_at_equal_rank(spark):
    """A doc ranked r in BOTH lists must outscore a doc ranked r in only
    one — the defining RRF property. Verified arithmetically from the
    emitted ranks."""
    out = QUERIES["q_rrf_fusion"](spark, SF_DIR).toPandas()
    for _, row in out.iterrows():
        want = 0.0
        if not math.isnan(row.r_lex if row.r_lex is not None else float("nan")):
            want += 1.0 / (60 + row.r_lex)
        if not math.isnan(row.r_sem if row.r_sem is not None else float("nan")):
            want += 1.0 / (60 + row.r_sem)
        assert abs(row.rrf_score - want) < 1e-8


def test_preference_pairs_recompute(spark):
    """chosen/rejected must be the min-doc_id argmax/argmin of the
    integer diversity score, recomputed in pandas from raw documents."""
    from stockmarketdata_dwb_etl_spark.catalog import load_table

    out = (
        QUERIES["q_preference_pairs"](spark, SF_DIR)
        .toPandas()
        .set_index("lang")
    )
    docs = load_table(spark, SF_DIR, "documents").toPandas()

    def score(text: str) -> int:
        w = [t for t in text.split(" ") if t]
        return 10000 * len(set(w)) // max(len(w), 1)

    docs["score"] = docs.text.map(score)
    for lang, g in docs.groupby("lang"):
        smax, smin = g.score.max(), g.score.min()
        if len(g) < 2 or smax <= smin:
            assert lang not in out.index
            continue
        row = out.loc[lang]
        assert row.chosen_id == g[g.score == smax].doc_id.min()
        assert row.rejected_id == g[g.score == smin].doc_id.min()
        assert row.chosen_score == smax and row.rejected_score == smin
        assert row.margin == smax - smin > 0
        assert row.n_docs == len(g)


def test_quantile_sketch_brackets_exact_quantile(spark):
    """The estimate's bin must CONTAIN the exact order-statistic
    quantile (error bounded by bin width by construction), and the
    bins must be monotone in p."""
    from stockmarketdata_dwb_etl_spark.catalog import load_table

    out = QUERIES["q_quantile_sketch"](spark, SF_DIR).toPandas()
    assert out.p.tolist() == [50, 90, 99]
    assert out.bin.is_monotonic_increasing
    prices = sorted(
        load_table(spark, SF_DIR, "orders")
        .select("o_totalprice")
        .toPandas()
        .o_totalprice.tolist()
    )
    n = len(prices)
    for _, row in out.iterrows():
        # first order statistic at cumulative share >= p% (the sketch's
        # own integer rule: 100*k >= p*n)
        k = -(-row.p * n // 100)  # ceil
        exact = float(prices[int(k) - 1])
        assert row.est_lo <= exact < row.est_hi
        assert row.n_total == n


def test_mixture_epochs_invariants(spark):
    """Allocations must sum to <= budget (integer div rounds down),
    epochs must be the exact ceil of wanted/available, and a source
    wanting less than it has must get epochs == 1."""
    out = QUERIES["q_mixture_epochs"](spark, SF_DIR).toPandas()
    assert len(out) > 0
    assert out.wanted_tokens.sum() <= 1_000_000
    for _, r in out.iterrows():
        assert r.epochs == -(-r.wanted_tokens // r.avail_tokens)
        if r.wanted_tokens <= r.avail_tokens:
            assert r.epochs == 1
        assert abs(r.upsample - round(r.wanted_tokens / r.avail_tokens, 4)) < 1e-9


def test_dedup_soft_weights_conservation(spark):
    """Σ n_docs must equal real docs + 2 synthetic dups per chain; every
    cluster's total weight is n_clusters * size * (1/size) = n_clusters,
    i.e. the weighted corpus equals the cluster count (the soft-dedup
    invariant); chains are size 3, singletons size 1."""
    from stockmarketdata_dwb_etl_spark.catalog import load_table

    out = QUERIES["q_dedup_soft_weights"](spark, SF_DIR).toPandas()
    docs = load_table(spark, SF_DIR, "documents").toPandas()
    n_docs, n_gen0 = len(docs), (docs.doc_id % 10 == 0).sum()
    assert set(out.cluster_size) == {1, 3}
    assert out.n_docs.sum() == n_docs + 2 * n_gen0
    row3 = out.set_index("cluster_size").loc[3]
    assert row3.n_clusters == n_gen0 and row3.n_docs == 3 * n_gen0
    row1 = out.set_index("cluster_size").loc[1]
    assert row1.n_docs == row1.n_clusters == n_docs - n_gen0
    assert abs(row3.weight - round(1.0 / 3, 6)) < 1e-9
    assert row1.weight == 1.0


def _cdc_chunks_py(text: str) -> list[str]:
    """Reference CDC chunker: boundary AFTER any token whose md5 hex
    digit 2 is '0' (matches the engine's stateless gate)."""
    import hashlib

    toks = [t for t in text.split(" ") if t]
    chunks, cur = [], []
    for t in toks:
        cur.append(t)
        if hashlib.md5(t.encode()).hexdigest()[1] == "0":
            chunks.append(" ".join(cur))
            cur = []
    if cur:
        chunks.append(" ".join(cur))
    return chunks


def test_cdc_chunks_edit_stability(spark):
    """The CDC property: editing ONE token changes only the chunk
    containing it (the gate is per-token, so every other boundary is
    unmoved — at most the edited chunk splits in two if the new token
    is itself a boundary). Fixed-window chunking shifts every
    downstream chunk; CDC must not."""
    from stockmarketdata_dwb_etl_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents").toPandas()
    text = max(docs.text, key=len)
    toks = [t for t in text.split(" ") if t]
    mid = len(toks) // 2
    edited = " ".join(toks[:mid] + ["zzzedited"] + toks[mid + 1 :])
    a, b = _cdc_chunks_py(text), _cdc_chunks_py(edited)
    sa, sb = set(a), set(b)
    # symmetric difference is the touched chunk(s) only: <=1 lost from
    # the original, <=2 gained (split case) — never a wholesale reshape
    assert len(sa - sb) <= 1 and len(sb - sa) <= 2
    assert len(sa & sb) >= len(a) - 1


def test_cdc_chunks_report_consistency(spark):
    """The engine's per-lang report must agree with the python reference
    chunker recomputed over the raw corpus."""
    from collections import Counter

    from stockmarketdata_dwb_etl_spark.catalog import load_table

    out = QUERIES["q_cdc_chunks"](spark, SF_DIR).toPandas().set_index("lang")
    docs = load_table(spark, SF_DIR, "documents").toPandas()
    for lang, g in docs.groupby("lang"):
        counts = Counter()
        toks = 0
        for text in g.text:
            for c in _cdc_chunks_py(text):
                counts[c] += 1
                toks += len(c.split(" "))
        row = out.loc[lang]
        n_chunks = sum(counts.values())
        assert row.n_chunks == n_chunks
        assert row.n_distinct == len(counts)
        assert row.n_dup_chunks == sum(v for v in counts.values() if v > 1)
        assert abs(row.avg_chunk_tokens - round(toks / n_chunks, 4)) < 1e-9


def test_dedup_index_probe_equals_inplan_pipeline(spark):
    """The materialized-signature probe path must produce EXACTLY the
    pairs the in-plan q_dedup_cross_corpus pipeline produces — the
    index loses nothing (same split, LSH params, verify threshold)."""
    via_index = (
        QUERIES["q_dedup_index_probe"](spark, SF_DIR)
        .toPandas()
        .sort_values(["corpus_id", "holdout_id"])
        .reset_index(drop=True)
    )
    in_plan = (
        QUERIES["q_dedup_cross_corpus"](spark, SF_DIR)
        .toPandas()
        .sort_values(["corpus_id", "holdout_id"])
        .reset_index(drop=True)
    )
    assert len(via_index) == len(in_plan) > 0
    assert (via_index.corpus_id == in_plan.corpus_id).all()
    assert (via_index.holdout_id == in_plan.holdout_id).all()
    assert (via_index.jaccard == in_plan.jaccard).all()
