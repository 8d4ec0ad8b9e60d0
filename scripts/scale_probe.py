"""Measured scaling curves: run headline operators at x1/x3/x10 of sf0.1
and record how wall time grows with input size.

The engine's 100 TB posture is argued from plan shape (PLANS.md, SCALE.md);
this probe adds MEASUREMENT: derived datasets at three sizes, identical
layout, the same registered queries, noop-sink timing (best of 2). A
scale-correct operator shows ~linear growth (ratio_10x near 10 or below on
fixed cores); a superlinear ratio flags a shuffle/skew problem that would
bite at cluster scale.

Dataset construction (under .scratch, fixture-fingerprinted):
- lineitem/orders replicate with per-replica orderkey offsets so the
  order⨝lineitem relationship — and therefore join selectivity per row —
  is preserved exactly; customer is copied unscaled (fact tables outgrow
  dims in real warehouses, so per-customer fan-out rising x10 is the
  honest scale-up).
- events replicate with event_id offsets (user/time distributions
  unchanged → same window/partition shapes, x10 rows).
- documents replicate with doc_id offsets AND replica-salted tokens
  (every space becomes " r<i>_", so every shingle carries the replica
  tag): within-replica near-dup structure is preserved verbatim while
  cross-replica Jaccard is 0 — the dedup workload grows x10, not x100.

Usage: python scripts/scale_probe.py [--quick]   (writes SCALEPROBE.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = "/root/testdata/sf0.1"
SCALES = (1, 3, 10)
PROBES = (
    "q_agg_groupby",        # hash agg over lineitem
    "q_tpch_q3",            # 3-way join + agg + top-k
    "q_window_moving_avg",  # partitioned window over lineitem
    "q_topk_per_group",     # per-group top-k
    "q_dedup_exact",        # hash-groupBy dedup over documents
    "q_dedup_minhash",      # LSH banding + verify over documents
    "q_bloom_join",         # bloom build + prefilter + join
    "q_lm_score",           # bigram LM train + doc-score join
    "q_pagerank_iter",      # iterative superstep join chain over co-purchase graph
    "q_boilerplate_ratio",  # inverted shingle index over documents
    "q_sessionize_batch",   # stacked per-user windows over events
    "q_interval_overlap",   # keyed interval join over events
    "q_common_neighbors",   # deduped-edge self-join, bounded per-key fanout
    "q_dedup_blocked_edit", # blocking-key join + Levenshtein verify
    "q_seasonal_decompose", # centered-frame window + hod agg over events
    "q_dedup_cross_corpus", # LSH union pass + cross-side verify over documents
    "q_quality_classifier", # map-only feature scoring over documents
    "q_beta_capm",          # returns window + broadcast market join over events
    "q_pair_affinity",      # one-shuffle basket build + map-side pair explode
    "q_active_users",       # per-(day,bucket) bitmap build + 7-day OR-merge fanout
    "q_chunk_documents",    # map-side token-window chunk fan-out over documents
    "q_sentence_dedup",     # sentence-digest frequency shuffle over documents
    "q_spearman_corr",      # per-pair midrank windows over events
    "q_cci",                # bounded array-carrying window over bars (round 6)
    "q_kalman_filter",      # applyInPandas sequential recurrence (round 6)
    "q_kruskal_wallis",     # value-histogram + global prefix sum (round 6)
    "q_granger_lite",       # bar_ts-co-partitioned pair join + moments (round 6)
    "q_corpus_pipeline",    # canonicalize→gate→dedup→split integration (round 6)
    "q_ngram_coverage",     # vocabulary-sized distinct-bigram shuffles (round 8)
    "q_attribution_position",  # journey windows over events (round 8)
    "q_curriculum_buckets",    # per-lang ntile sort over documents (round 8)
    "q_lorenz_curve",          # global_row_number rank path over custkey agg (round 8)
    "q_rrf_fusion",            # scan+TakeOrdered rankers + k-row fusion join (round 9; both ranker sides scale since r11 replicates embeddings)
    "q_preference_pairs",      # two-pass group argmax over documents (round 9)
    "q_quantile_sketch",       # O(#bins) mergeable histogram over orders (round 9)
    "q_mixture_epochs",        # per-source token hash-agg + 1-row broadcast (round 9)
    "q_dedup_soft_weights",    # transitive-closure supersteps + histogram aggs (round 9)
    "q_record_linkage",        # blocked self-join + pattern agg + m/u reduce (round 10; customer stays base-size, so this probes fixed-cost flatness)
    "q_heaps_law",             # token explode + two range-partitioned prefix sums + OLS reduce (round 10)
    "q_zipf_fit",              # token hash-agg + vocab-bounded top-k + OLS reduce (round 10)
    "q_var_backtest",          # bounded 50-row array-carrying VaR window over events (round 10)
    "q_bitemporal_asof",       # version union + probe join + struct-argmax hash-agg over orders (round 10)
    "q_er_golden_record",      # blocked pair join + folded-closure supersteps + survivorship windows (round 10; customer base-size → fixed-cost flatness probe)
    "q_croston_forecast",      # sparse demand windows + closed-form SES hash-agg over lineitem (round 10)
    "q_countmin_freq",         # mergeable counter-matrix hash-agg over events (round 10)
    "q_conformal_intervals",   # rank windows + bounded calibration collect over events (round 10)
    "q_shapley_attribution",   # (user,day) mask hash-agg + 16-row lattice over events (round 10)
    "q_label_propagation",     # kNN-sparsified edge build + 2 sync LPA rounds over lineitem (round 10)
    "q_cuped_adjustment",      # one-pass covariate/metric moment agg over orders (round 10)
    "q_matched_pairs_att",     # stratified nearest-neighbor match join over customer x orders (round 10; customer base-size -> fixed-cost flatness)
    "q_coreset_kcenter",        # k-1 supersteps of argmax + broadcast tighten over embeddings (round 11)
    "q_whitening_stats",        # d(d-1)/2-per-vector pair fan-out + (dim,dim) hash-agg over embeddings (round 11)
    "q_kneser_ney_lm",          # map-side bigram build + vocab-sized KN model joins over documents (round 11)
    "q_js_divergence",          # word-count hash-agg + |sources|^2 x 200 pair table over documents (round 11)
    "q_collocation_llr",        # bigram/unigram token-key shuffles + broadcast marginals over documents (round 12)
    "q_winsorized_stats",       # type-keyed rank window + split-sum moment agg over events (round 12)
    "q_haar_energy",            # 3 halving (symbol,pair) hash-aggs over events (round 12)
    "q_mmd_drift",              # map-side RFF projection + (side,feature) agg over embeddings (round 12)
    "q_cka_alignment",          # d^2-bounded pair fan + (dim,dim) hash-agg over embeddings (round 12)
    "q_markov_attribution",     # one user-keyed journey shuffle + variants x states value iteration (round 12)
    "q_price_elasticity",       # broadcast part join + brand-keyed moment agg over lineitem (round 12)
    "q_stump_split",            # distributed global rank + 19-threshold broadcast grid over customer (round 12; customer base-size -> fixed-cost flatness)
    "q_join_range_binned",      # per-size partial agg + bin-domain broadcast (r12-opt rewrite of the pair-producing band join)
    "q_rolling_corr",           # prefix-sum sliding frames over events (r12-opt rewrite of the 20-row re-added frames)
)


def build_scaled(spark, out_dir: str, n: int) -> None:
    from pyspark.sql import functions as F

    from stockmarketdata_dwb_etl_spark.catalog import load_table

    os.makedirs(out_dir, exist_ok=True)

    def done(table: str) -> bool:
        return os.path.exists(os.path.join(out_dir, f"{table}.parquet", "_SUCCESS"))

    def reps(df, make_cols):
        parts = []
        for i in range(n):
            parts.append(df.select(*make_cols(i)))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    li = load_table(spark, BASE_SF, "lineitem")
    ok_off = 10_000_000  # beyond any real orderkey at sf0.1
    if not done("lineitem"):
        reps(
        li,
        lambda i: [
            (F.col("l_orderkey") + i * ok_off).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        ],
        ).write.mode("overwrite").parquet(os.path.join(out_dir, "lineitem.parquet"))

    orders = load_table(spark, BASE_SF, "orders")
    if not done("orders"):
        reps(
        orders,
        lambda i: [
            (F.col("o_orderkey") + i * ok_off).alias("o_orderkey"),
            *[c for c in orders.columns if c != "o_orderkey"],
        ],
        ).write.mode("overwrite").parquet(os.path.join(out_dir, "orders.parquet"))

    ev = load_table(spark, BASE_SF, "events")
    if not done("events"):
        reps(
        ev,
        lambda i: [
            (F.col("event_id") + i * 1_000_000_000).alias("event_id"),
            *[c for c in ev.columns if c != "event_id"],
        ],
        ).write.mode("overwrite").parquet(os.path.join(out_dir, "events.parquet"))

    docs = load_table(spark, BASE_SF, "documents")
    if not done("documents"):
        # n_chars recomputes over the salted text (replica docs are longer):
        # derived columns must stay consistent or length-bucketed operators
        # (q_dedup_blocked_edit) see artificial cross-replica collisions
        reps(
        docs,
        lambda i: [
            (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
            F.regexp_replace(F.col("text"), " ", f" r{i}_").alias("text"),
            F.length(
                F.regexp_replace(F.col("text"), " ", f" r{i}_")
            ).cast("long").alias("n_chars"),
            *[c for c in docs.columns if c not in ("doc_id", "text", "n_chars")],
        ],
        ).write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))

    emb = load_table(spark, BASE_SF, "embeddings")
    if not done("embeddings"):
        # replicate with vec_id offsets (embedding values / labels copied):
        # the round-11 embedding-table probes (q_coreset_kcenter,
        # q_whitening_stats) need the VECTOR COUNT to scale or their
        # ratios trivially measure a fixed input. Replica vectors being
        # exact duplicates is fine for these shapes (scan-, fan-out- and
        # agg-bound, not result-size-bound). Note vec 0 stays unique, so
        # seeded operators keep their seed.
        reps(
        emb,
        lambda i: [
            (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
            *[c for c in emb.columns if c != "vec_id"],
        ],
        ).write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))

    # unscaled dims the probe queries join against
    for t in ("customer", "supplier", "part", "nation", "region"):
        if not done(t):
            load_table(spark, BASE_SF, t).write.mode("overwrite").parquet(
                os.path.join(out_dir, f"{t}.parquet")
            )


def main() -> None:
    quick = "--quick" in sys.argv
    scales = (1, 10) if quick else SCALES
    only: tuple[str, ...] = ()
    if "--only" in sys.argv:
        only = tuple(sys.argv[sys.argv.index("--only") + 1 :])

    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all
    from stockmarketdata_dwb_etl_spark.scratch import SCRATCH, fixture_tag
    from stockmarketdata_dwb_etl_spark.session import get_spark

    load_all()
    spark = get_spark(app_name="scale-probe")

    root = os.path.join(SCRATCH, "scaleprobe", fixture_tag(BASE_SF))
    dirs = {}
    for n in scales:
        d = os.path.join(root, f"x{n}")
        build_scaled(spark, d, n)  # per-table idempotent
        dirs[n] = d

    def run(name: str, sf_dir: str) -> float:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    run("q_agg_groupby", dirs[scales[0]])  # warm-up

    def steady(name: str, sf_dir: str) -> float:
        """Plateau timing (same rule as bench.py): keep rerunning while a
        run improves the best by >20% (min 2, cap 6). On the r10 VM the
        first executions of a heavy codegen method measure JIT tier-up,
        not throughput — and since the x1 point runs coldest, best-of-2
        would systematically DEFLATE ratio_10x (cold x1 denominator,
        warm x10 numerator)."""
        best = min(run(name, sf_dir), run(name, sf_dir))
        for _ in range(4):
            t = run(name, sf_dir)
            improved = t < best * 0.8
            best = min(best, t)
            if not improved:
                break
        return round(best, 3)

    results: dict[str, dict] = {}
    for name in only if only else PROBES:
        row = {}
        for nn in scales:
            row[f"x{nn}"] = steady(name, dirs[nn])
        row["ratio_10x"] = round(row[f"x{scales[-1]}"] / max(row[f"x{scales[0]}"], 1e-9), 2)
        results[name] = row
        print(name, row, flush=True)

    if only:  # merge a targeted re-probe into the existing file
        try:
            with open("SCALEPROBE.json") as f:
                prior = json.load(f)
        except (OSError, ValueError):
            prior = {"base_sf": 0.1, "scales": list(scales), "probes": {}}
        prior["probes"].update(results)
        payload = prior
    else:
        payload = {"base_sf": 0.1, "scales": list(scales), "probes": results}
    with open("SCALEPROBE.json", "w") as f:
        json.dump(payload, f, indent=2)
    print("wrote SCALEPROBE.json")


if __name__ == "__main__":
    main()
