"""Property-based spot checks (SURVEY.md §5.5, hypothesis): K/M/B and
percent format→parse roundtrips over generated float ranges, and dedup
idempotence. Each example batches all generated values into ONE DataFrame
so the Spark round-trip cost is paid per example, not per value."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from stockmarketdata_dwb_etl_spark.functions.parsing import parse_kmb, parse_pct

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_vals = st.lists(
    st.floats(min_value=0.01, max_value=999.99).map(lambda x: round(x, 2)),
    min_size=1,
    max_size=24,
)


@_settings
@given(vals=_vals, suffixes=st.lists(st.sampled_from("KMB"), min_size=1, max_size=24))
def test_kmb_format_parse_roundtrip(spark, vals, suffixes):
    mult = {"K": 1e3, "M": 1e6, "B": 1e9}
    rows = [(f"{v:.2f}{s}", v * mult[s]) for v, s in zip(vals, suffixes)]
    df = spark.createDataFrame(rows, "raw string, want double")
    for r in df.select(parse_kmb(F.col("raw")).alias("got"), "want").collect():
        assert r.got == pytest.approx(r.want, rel=1e-9)


@_settings
@given(vals=st.lists(st.floats(min_value=-99.99, max_value=99.99), min_size=1, max_size=24))
def test_pct_format_parse_roundtrip(spark, vals):
    rows = [(f"{v:+.2f}%", round(v, 2)) for v in vals]
    df = spark.createDataFrame(rows, "raw string, want double")
    for r in df.select(parse_pct(F.col("raw")).alias("got"), "want").collect():
        assert r.got == pytest.approx(r.want, abs=1e-9)


@_settings
@given(
    keys=st.lists(
        st.tuples(st.integers(min_value=0, max_value=5), st.sampled_from("abc")),
        min_size=1,
        max_size=40,
    )
)
def test_dedup_idempotence(spark, keys):
    """dedup(dedup(df)) == dedup(df) and output keys = distinct input keys."""
    df = spark.createDataFrame(keys, "k int, tag string")
    once = df.dropDuplicates(["k", "tag"])
    twice = once.dropDuplicates(["k", "tag"])
    got_once = sorted((r.k, r.tag) for r in once.collect())
    got_twice = sorted((r.k, r.tag) for r in twice.collect())
    assert got_once == got_twice == sorted(set(keys))


@_settings
@given(keys=st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=24))
def test_hash_bucket_range_and_engine_parity(spark, keys):
    """hash_bucket must land in [0, 256) and agree with an independent
    Python md5 computation for every key (the engine-portability property
    the train/val/test split rests on)."""
    import hashlib

    from stockmarketdata_dwb_etl_spark.queries.reports import hash_bucket

    df = spark.createDataFrame([(k,) for k in set(keys)], "doc_id long")
    got = {
        r.doc_id: r.bucket
        for r in df.select("doc_id", hash_bucket("doc_id").alias("bucket")).collect()
    }
    for k, b in got.items():
        expect = int(hashlib.md5(str(k).encode()).hexdigest()[:2], 16)
        assert b == expect
        assert 0 <= b < 256


@_settings
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 16) - 1),
            st.integers(min_value=0, max_value=(1 << 16) - 1),
        ),
        min_size=1,
        max_size=32,
        unique=True,
    )
)
def test_zorder_interleave_is_injective_and_ordered(spark, pairs):
    """Morton interleave must be a bijection on the bucket grid (distinct
    (a,b) -> distinct z) and must place points sharing a high-bit prefix
    in BOTH dims closer than points differing in a high bit — the
    property file skipping relies on."""
    from stockmarketdata_dwb_etl_spark.operators.zorder import zvalue

    df = spark.createDataFrame(pairs, "a int, b int").select(
        "a", "b", zvalue([F.col("a").cast("long"), F.col("b").cast("long")]).alias("z")
    )
    rows = df.collect()
    zs = {(r.a, r.b): r.z for r in rows}
    assert len(set(zs.values())) == len(pairs), "collision on the bucket grid"
    # python-reference interleave must agree exactly
    def ref(a, b):
        out = 0
        for i in range(16):
            out |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return out
    for (a, b), z in zs.items():
        assert z == ref(a, b)


@_settings
@given(keys=st.lists(st.integers(min_value=0, max_value=10**12), min_size=1,
                     max_size=200, unique=True))
def test_bloom_never_drops_a_member(spark, keys):
    """For ANY key set, every member must probe positive (the exactness of
    bloom_prefilter_join rests on zero false negatives)."""
    from stockmarketdata_dwb_etl_spark.operators.bloom import (
        build_bloom,
        might_contain,
    )

    dim = spark.createDataFrame([(k,) for k in keys], "k long")
    bf = build_bloom(dim, "k")
    hits = (
        dim.join(F.broadcast(bf))
        .where(might_contain(F.col("bf"), F.col("k")))
        .count()
    )
    assert hits == len(keys)
