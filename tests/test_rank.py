"""Distributed global ranking (operators/rank.py) must be bit-identical to
the single-reducer SQL window functions it replaces."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stockmarketdata_dwb_etl_spark.operators.rank import (
    cume_dist_expr,
    global_row_number,
    ntile_expr,
    percent_rank_expr,
)


@pytest.mark.parametrize("n,k", [(1, 4), (3, 4), (7, 3), (100, 10), (101, 10)])
def test_matches_sql_window_functions(spark, n, k):
    # deterministic pseudo-random order with a unique tie-break
    df = spark.range(n).select(
        F.col("id"), (F.xxhash64("id") % 97).alias("v")
    )
    got = (
        global_row_number(df, ["v", "id"])
        .select(
            "id",
            "row_idx",
            ntile_expr(F.col("row_idx"), F.col("n_total"), k).alias("nt"),
            F.round(percent_rank_expr(F.col("row_idx"), F.col("n_total")), 6).alias("pr"),
            F.round(cume_dist_expr(F.col("row_idx"), F.col("n_total")), 6).alias("cd"),
        )
        .collect()
    )
    w = Window.orderBy("v", "id")
    want = df.select(
        "id",
        F.row_number().over(w).alias("row_idx"),
        F.ntile(k).over(w).alias("nt"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_no_unpartitioned_window_over_data(spark):
    """The plan's only unpartitioned window runs over the per-partition
    count table, not the data: the data-side window must be partitioned."""
    df = spark.range(1000).select(F.col("id"), (F.col("id") * 7 % 31).alias("v"))
    plan = global_row_number(df, ["v", "id"])._jdf.queryExecution().executedPlan().toString()
    # every Window over the ranged data carries a partition spec (__pid)
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line:
            assert "__pid" in line, line
