"""Bloom join prefilter (operators/bloom.py): the filter must actually
prune non-matching fact rows (that's the point — shuffle reduction), admit
every matching row (no false negatives, ever), and compose into a join
that is EXACTLY the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stockmarketdata_dwb_etl_spark.operators.bloom import (
    bloom_prefilter_join,
    build_bloom,
    might_contain,
)


def test_no_false_negatives_and_low_fpp(spark):
    # dim keys 0..999; probe keys 0..19999 → 1000 members, 19000 outsiders
    dim = spark.range(1000).select(F.col("id").alias("k"))
    probe = spark.range(20000).select(F.col("id").alias("k"))
    bf = build_bloom(dim, "k")
    hits = (
        probe.join(F.broadcast(bf))
        .where(might_contain(F.col("bf"), F.col("k")))
        .select("k")
        .collect()
    )
    hit_keys = {r.k for r in hits}
    assert set(range(1000)) <= hit_keys, "bloom dropped a member key"
    fpp = (len(hit_keys) - 1000) / 19000
    assert fpp < 0.01, f"false-positive rate too high: {fpp:.4f}"


def test_join_is_exact(spark):
    fact = spark.range(5000).select(
        F.col("id").alias("fk"), (F.col("id") % 997).alias("payload")
    )
    dim = (
        spark.range(5000)
        .where(F.col("id") % 37 == 0)
        .select(F.col("id").alias("dk"), F.lit("d").alias("tag"))
    )
    got = (
        bloom_prefilter_join(fact, dim, "fk", "dk")
        .select("fk", "payload", "dk", "tag")
        .collect()
    )
    want = (
        fact.join(dim, fact["fk"] == dim["dk"])
        .select("fk", "payload", "dk", "tag")
        .collect()
    )
    assert sorted(got) == sorted(want)


def test_rejects_fact_destroying_joins(spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        bloom_prefilter_join(df, df, "k", "k", how="full")
