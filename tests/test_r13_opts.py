"""Focused tests for the round-13 optimization internals:

- _ssum_hilo/_ssum_fin (two-long-bucket sum) must be BIT-identical to the
  DECIMAL(38,n) _ssum over adversarial magnitudes, signs and grouping.
- connected_components(assume_distinct=True) must produce the identical
  component labeling, and min-label propagation must be idempotent over
  duplicate edges (the property the flag relies on).
- the markov value-iteration fold and single-window journey extraction
  are covered end-to-end by the oracle differential; here we pin the
  cheap structural invariant: the journey plan carries ONE Window sort
  order (no DESC re-sort).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_ssum_hilo_bit_identical_grouped(spark):
    from stockmarketdata_dwb_etl_spark.queries.dataops11 import (
        _ssum,
        _ssum_fin,
        _ssum_hilo,
    )

    # adversarial: mixed signs, half-boundary multiples of 1e-12, tiny
    # magnitudes, and values near |x| = 1 (the documented bound)
    vals = []
    for i in range(1, 500):
        vals.append((i % 7, ((i * 1_000_003) % 2_000_000 - 1_000_000) / 1e6))
        vals.append((i % 7, ((i * 37) % 1_000_000) * 1e3 / 1e12 + 5e-13))
        vals.append((i % 7, -((i * 11) % 997) * 1e-9))
    df = spark.createDataFrame(vals, ["g", "x"])

    old = df.groupBy("g").agg(_ssum(F.col("x"), 12).alias("s"))
    hi, lo = _ssum_hilo(F.col("x"), 12)
    new = (
        df.groupBy("g")
        .agg(hi.alias("sh"), lo.alias("sl"))
        .select("g", _ssum_fin(F.col("sh"), F.col("sl"), 12).alias("s"))
    )
    got_old = {r["g"]: r["s"] for r in old.collect()}
    got_new = {r["g"]: r["s"] for r in new.collect()}
    assert got_old == got_new
    # bits, not just ==: repr distinguishes -0.0/0.0 and every mantissa bit
    assert {k: repr(v) for k, v in got_old.items()} == {
        k: repr(v) for k, v in got_new.items()
    }


def test_ssum_hilo_order_independent(spark):
    from stockmarketdata_dwb_etl_spark.queries.dataops11 import (
        _ssum_fin,
        _ssum_hilo,
    )

    vals = [(((i * 13) % 1000 - 500) / 777.0,) for i in range(1, 800)]
    hi, lo = _ssum_hilo(F.col("x"), 12)

    def total(df):
        return (
            df.agg(hi.alias("sh"), lo.alias("sl"))
            .select(_ssum_fin(F.col("sh"), F.col("sl"), 12).alias("s"))
            .collect()[0]["s"]
        )

    fwd = spark.createDataFrame(vals, ["x"])
    rev = spark.createDataFrame(list(reversed(vals)), ["x"]).repartition(7)
    assert total(fwd) == total(rev)


def test_connected_components_duplicate_edges_idempotent(spark):
    """assume_distinct relies on min-label propagation being unaffected
    by duplicate edges: dedup vs no-dedup must label identically even on
    an edge table WITH duplicates."""
    from stockmarketdata_dwb_etl_spark.operators.dedup import (
        connected_components,
    )

    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)]
    dup = edges + edges + [(2, 3)]
    df_dedup = spark.createDataFrame(dup, ["src", "dst"])
    a = {
        (r["id"], r["cluster_rep"])
        for r in connected_components(df_dedup).collect()
    }
    b = {
        (r["id"], r["cluster_rep"])
        for r in connected_components(
            df_dedup, assume_distinct=True
        ).collect()
    }
    assert a == b
    # ground truth: min label per chain component
    want = {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20), (23, 20),
    }
    assert a == want


def test_markov_journey_single_sort_order(spark):
    """The journey extraction shares ONE (user_id, ord_key ASC) sort: the
    physical plan must not contain a descending user-keyed sort (the old
    row_number(DESC) loss-edge pass)."""
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all

    load_all()
    df = QUERIES["q_markov_attribution"](spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "DESC" not in plan, "journey pass reintroduced a DESC sort"
