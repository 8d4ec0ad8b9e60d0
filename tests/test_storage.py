"""Physical-layout assertions: partition pruning actually prunes, bucketed
joins actually skip the exchange — the plan-shape guarantees behind the
100 TB posture, checked on the real explain output."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_partitioned_read_prunes(spark):
    """A literal filter on the partition column must reach the scan as a
    partition filter (0 data files of other dates read)."""
    from stockmarketdata_dwb_etl_spark.queries.storage import (
        write_events_partitioned,
    )

    out = write_events_partitioned(spark, SF_DIR)
    back = spark.read.parquet(out)
    one_day = back.select(F.min("event_date")).first()[0]
    plan = (
        back.filter(F.col("event_date") == F.lit(one_day))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan
    assert "event_date" in plan.split("PartitionFilters", 1)[1][:200]


def test_bucketed_join_has_no_shuffle(spark):
    """Both join inputs are bucketed by the key into the same bucket count:
    the sort-merge join must run with no hash-partitioning exchange."""
    from stockmarketdata_dwb_etl_spark.queries.storage import write_bucketed

    orders = spark.table(write_bucketed(spark, SF_DIR, "orders", "o_orderkey"))
    lineitem = spark.table(write_bucketed(spark, SF_DIR, "lineitem", "l_orderkey"))
    joined = orders.hint("merge").join(
        lineitem, F.col("l_orderkey") == F.col("o_orderkey")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_stateful_totals_equal_batch(spark):
    """Final emission of the applyInPandasWithState operator per user must
    equal the batch groupBy totals (batch ≡ stream for running state)."""
    from stockmarketdata_dwb_etl_spark.catalog import load_table
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all

    load_all()
    got = {
        r.user_id: (r.n_events, r.sum_value)
        for r in QUERIES["q_stream_stateful"](spark, SF_DIR).collect()
    }
    expect = {
        r.user_id: (r.n_events, r.sum_value)
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .collect()
    }
    assert set(got) == set(expect)
    for uid, (n, _s) in expect.items():
        assert got[uid][0] == n
        assert abs(got[uid][1] - _s) < 1e-6


def test_embedding_dedup_finds_all_injected(spark):
    """Every injected near-dup embedding pair must be found at cos ≥ 0.9 and
    nothing else (max natural pairwise cosine ≈ 0.51 in the fixtures)."""
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["q_dedup_embedding"](spark, SF_DIR).collect()
    assert all(r.id_b == r.id_a + 2_000_000 for r in rows)
    assert all(r.cos_sim >= 0.99 for r in rows)
    import duckdb

    n_expected = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/embeddings.parquet') "
        "WHERE vec_id % 10 = 0"
    ).fetchone()[0]
    assert len(rows) == n_expected


def test_ivf_ann_recall_vs_exact(spark):
    """IVF probing 4/16 cells must still recover most of the exact top-10
    (injected near-neighbors land in the probe's own cell)."""
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
    approx = {r.vec_id for r in QUERIES["q_ann_ivf_topk"](spark, SF_DIR).collect()}
    assert len(exact & approx) >= 8, f"IVF recall too low: {exact & approx}"


def test_ivf_index_prunes_and_matches_inplan(spark):
    """The materialized IVF index must (a) be laid out by cell_id and (b)
    return the same top-k as the in-plan IVF variant."""
    import os

    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all

    load_all()
    pruned = QUERIES["q_ann_ivf_pruned"](spark, SF_DIR).collect()
    inplan = QUERIES["q_ann_ivf_topk"](spark, SF_DIR).collect()
    assert [r.vec_id for r in pruned] == [r.vec_id for r in inplan]
    assert [r.cos_sim for r in pruned] == [r.cos_sim for r in inplan]
    from stockmarketdata_dwb_etl_spark.scratch import fixture_tag

    tag = fixture_tag(SF_DIR)
    cells = [
        d
        for d in os.listdir(f"/root/repo/.scratch/ivf_index/{tag}")
        if d.startswith("cell_id=")
    ]
    assert len(cells) > 1


def test_compaction_reduces_file_count(spark):
    """q_compact_small_files must actually shrink the file count (64 → 4)
    while preserving every row."""
    import os

    from stockmarketdata_dwb_etl_spark.catalog import load_table
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all

    load_all()
    got = {r.event_type: r.n for r in QUERIES["q_compact_small_files"](spark, SF_DIR).collect()}
    expect = {
        r.event_type: r.n
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expect
    from stockmarketdata_dwb_etl_spark.scratch import fixture_tag

    tag = fixture_tag(SF_DIR)
    n_files = lambda d: len(  # noqa: E731
        [f for f in os.listdir(d) if f.endswith(".parquet")]
    )
    frag = f"/root/repo/.scratch/events_fragmented/{tag}"
    compacted = f"/root/repo/.scratch/events_compacted/{tag}"
    assert n_files(frag) == 64
    assert n_files(compacted) == 4


def test_hash_split_deterministic_and_total(spark):
    """The hash split must be stable across runs, partition the corpus
    exactly (no doc lost or double-assigned), and be ~90/5/5."""
    from stockmarketdata_dwb_etl_spark.catalog import load_table
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all

    load_all()
    a = {r.split: r.n_docs for r in QUERIES["q_hash_split"](spark, SF_DIR).collect()}
    b = {r.split: r.n_docs for r in QUERIES["q_hash_split"](spark, SF_DIR).collect()}
    assert a == b
    total = load_table(spark, SF_DIR, "documents").count()
    assert sum(a.values()) == total
    assert a["train"] > a["val"] and a["train"] > a["test"]
    # map-side only before the aggregate: no join/window in the plan
    plan = (
        QUERIES["q_hash_split"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Window" not in plan
