"""Round-3 operator property tests: forward as-of matching, the CUSUM
window identity vs the textbook recurrence, skyline dominance vs brute
force, PageRank mass conservation, exact-total allocation, and batch
sessionization boundaries.

These assert the MATH of each operator on hand-built inputs; the DuckDB
differential test (tests/test_oracle.py) separately certifies engine
equivalence on the fixture tables.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stockmarketdata_dwb_etl_spark.operators.asof import asof_join_forward
from tests.conftest import SF_DIR


def test_asof_forward_picks_earliest_following(spark):
    left = spark.createDataFrame(
        [(1, 100, "l1"), (1, 250, "l2"), (2, 50, "l3")],
        "k int, ts long, lpay string",
    )
    right = spark.createDataFrame(
        [(1, 100, "r_eq"), (1, 140, "r_mid"), (1, 90, "r_before"), (2, 40, "r_past")],
        "k int, ts long, rpay string",
    )
    got = {
        (r.k, r.ts): r.rpay
        for r in asof_join_forward(
            left, right, key_cols=["k"], ts_col="ts", right_payload=["rpay"]
        ).collect()
    }
    # equal ts matches (forward-inclusive); earliest following wins
    assert got[(1, 100)] == "r_eq"
    assert got[(1, 250)] is None  # nothing at or after 250
    assert got[(2, 50)] is None  # right row is strictly before


def test_asof_forward_vs_backward_symmetry(spark):
    """Forward as-of on negated numeric time == backward as-of."""
    from stockmarketdata_dwb_etl_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame(
        [(1, t, f"l{t}") for t in (10, 20, 30, 45)], "k int, ts long, lpay string"
    )
    right = spark.createDataFrame(
        [(1, t, f"r{t}") for t in (12, 28, 44)], "k int, ts long, rpay string"
    )
    fwd = {
        r.ts: r.rpay
        for r in asof_join_forward(
            left, right, key_cols=["k"], ts_col="ts", right_payload=["rpay"]
        ).collect()
    }
    neg = F.col("ts") * -1
    bwd = {
        -r.ts: r.rpay
        for r in asof_join_backward(
            left.withColumn("ts", neg),
            right.withColumn("ts", neg),
            key_cols=["k"],
            ts_col="ts",
            right_payload=["rpay"],
        ).collect()
    }
    assert fwd == bwd


def test_cusum_identity_matches_recurrence(spark):
    """P_i - min(P_j, j<=i) == the textbook max(0, S+x-mu) recurrence."""
    import itertools

    xs = [3.0, -1.0, 4.0, -7.0, 2.0, 2.0, -1.0, 5.0]
    mu = 1.0
    # textbook sequential CUSUM
    expect, s = [], 0.0
    for x in xs:
        s = max(0.0, s + x - mu)
        expect.append(round(s, 9))
    # window identity
    pfx = list(itertools.accumulate(x - mu for x in xs))
    mins = list(itertools.accumulate(pfx, min))
    got = [round(p - min(0.0, m), 9) for p, m in zip(pfx, mins)]
    # NOTE: the identity needs min over prefix INCLUDING the empty prefix
    # (0), exactly like the query's running min starting at the frame
    # head. Validate against the recurrence:
    assert got == expect


def test_skyline_matches_bruteforce(spark):
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["q_skyline_pareto"](spark, SF_DIR).collect()
    got = {(r.o_orderkey) for r in rows}

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF_DIR}/orders.parquet')"
    )
    brute = {
        r[0]
        for r in con.execute(
            """
            SELECT o_orderkey FROM orders a
            WHERE NOT EXISTS (
                SELECT 1 FROM orders b
                WHERE (b.o_totalprice < a.o_totalprice
                       AND b.o_orderdate >= a.o_orderdate)
                   OR (b.o_totalprice <= a.o_totalprice
                       AND b.o_orderdate > a.o_orderdate)
            )
            """
        ).fetchall()
    }
    assert got == brute


def test_pagerank_mass_conserved(spark):
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["q_pagerank_iter"](spark, SF_DIR).collect()
    total = sum(r["rank"] for r in rows)
    # with no dangling mass loss beyond isolated nodes, total ≈ 1
    assert rows, "pagerank returned no nodes"
    assert abs(total - 1.0) < 0.05
    assert all(r["rank"] > 0 for r in rows)


def test_allocation_sums_exactly(spark):
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["q_allocation_largest_remainder"](spark, SF_DIR).collect()
    assert sum(r.allocated_units for r in rows) == 10000


def test_sessionize_gap_boundary(spark):
    """Events exactly 30 min apart stay in ONE session (> gap, not >=)."""
    from stockmarketdata_dwb_etl_spark.queries import timeseries2  # noqa: F401

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1),
            (1, "2024-01-01 00:30:00", 2),  # exactly the gap → same session
            (1, "2024-01-01 01:00:00.000001", 3),  # 1 µs past → new session
        ],
        "user_id long, ts string, event_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    from pyspark.sql.window import Window

    wlag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = df.select(
        "user_id",
        "ts",
        "event_id",
        F.lag("ts").over(wlag).alias("__prev_ts"),
    ).select(
        "event_id",
        F.when(
            F.col("__prev_ts").isNull()
            | (
                F.expr("timestampdiff(MICROSECOND, __prev_ts, ts)")
                > F.lit(30 * 60 * 1_000_000)
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    got = {r.event_id: r.new_session for r in flagged.collect()}
    assert got == {1: 1, 2: 0, 3: 1}


def test_running_distinct_is_monotone_and_bounded(spark):
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["q_running_distinct"](spark, SF_DIR).limit(5000).collect()
    last = {}
    for r in rows:
        prev = last.get(r.user_id, 0)
        assert r.distinct_types_so_far >= prev  # monotone per user
        assert 1 <= r.distinct_types_so_far <= 5  # 5 event types exist
        last[r.user_id] = r.distinct_types_so_far
