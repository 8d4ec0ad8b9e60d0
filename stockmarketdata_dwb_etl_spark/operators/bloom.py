"""Bloom-filter join prefilter: cut fact-side shuffle volume for
selective joins whose dim side is too large to broadcast.

The 100 TB problem: `fact ⨝ selective_dim` shuffles the ENTIRE fact table
even when only a few percent of fact rows survive the join. Spark's own
runtime row-level filtering injects a `bloom_filter_agg`/`might_contain`
pair for exactly this case, but the aggregate is not exposed to the public
function registry — so this operator builds the same shape from public
primitives, all JVM-side:

1. BUILD — one pass over the dim keys: k=3 hash positions per key
   (xxhash64 with distinct seeds, pmod into m bits), exploded to
   (word, bit) pairs and reduced with a `bit_or` hash-aggregate into at
   most m/64 words; a final `map_from_entries(collect_list(...))` packs
   the words into a single map row. The bitmap is a SKETCH (m/8 bytes,
   default 16 KiB) — the collect_list reducer sees ≤ m/64 = 2048 rows no
   matter how many dim keys exist, so the build is two partial-agg
   shuffles of sketch-sized data.
2. PROBE — the one-row bitmap map cross-joins (broadcast) onto the fact
   and a conjunction of k `element_at >> bit & 1` checks filters fact
   rows BEFORE the join shuffle. False-positive rate with m=131072,
   k=3 stays < 1% up to ~10k dim keys; scale m with the dim cardinality
   (the bitmap stays executor-memory-trivial into the billions of bits).
3. JOIN — the real equi-join runs on the surviving fact rows; bloom false
   positives are eliminated here, so the operator is EXACT for inner/
   left-semi joins regardless of filter quality — the bloom only changes
   how many rows reach the exchange.

Reference parity note: the reference ships no distributed join at all
(its joins happen in BigQuery after load, dump_bigq.py); this operator is
part of the engine's 100 TB join toolkit alongside broadcast
(queries/joins.py), bucketing (queries/storage.py) and salting (skew.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 2^17 bits = 16 KiB bitmap; k=3 hashes. Tuned for ~10^4 build keys at
#: <1% fpp — raise M_BITS linearly with dim cardinality at scale.
M_BITS = 1 << 17
K_HASHES = 3
_SEEDS = (11, 23, 47)


def _positions(key: Column) -> list[Column]:
    """k bit positions for a key — xxhash64 under distinct seeds."""
    return [F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(M_BITS)) for seed in _SEEDS]


def build_bloom(dim: DataFrame, key: str) -> DataFrame:
    """One-row DataFrame ``bf: map<int,bigint>`` — the bitmap words.

    Distributed build: explode keys to k positions, partial+final bit_or
    per 64-bit word (≤ M_BITS/64 groups), pack into one map row.
    """
    pos = F.explode(F.array(*_positions(F.col(key)))).alias("pos")
    words = (
        dim.select(pos)
        .groupBy((F.col("pos") / 64).cast("int").alias("word"))
        # SQL expr: the Python shiftleft() only accepts a literal count
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)))").alias("bits"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("bf")
    )


def might_contain(bf: Column, key: Column) -> Column:
    """True iff every one of the key's k bits is set in the bitmap."""
    out = None
    for p in _positions(key):
        word = F.coalesce(
            F.element_at(bf, (p / 64).cast("int")), F.lit(0).cast("long")
        )
        # call_function: the SQL shiftleft takes a column shift count
        # (the Python-level F.shiftleft accepts only a literal int)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        hit = word.bitwiseAND(mask) != 0
        out = hit if out is None else (out & hit)
    return out


def bloom_prefilter_join(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str, how: str = "inner"
) -> DataFrame:
    """`fact ⨝ dim` with a bloom prefilter on the fact side.

    Exact for fact-preserving joins (inner / left_semi): the prefilter
    only REMOVES fact rows that cannot match (minus false positives,
    which the real join then drops). Outer joins that must keep
    non-matching fact rows would be broken by the prefilter — rejected.
    """
    if how not in ("inner", "left_semi", "semi"):
        raise ValueError(
            f"bloom_prefilter_join is exact only for inner/left_semi, got {how!r}"
        )
    bf = build_bloom(dim, dim_key)
    pruned = fact.join(F.broadcast(bf)).where(
        might_contain(F.col("bf"), F.col(fact_key))
    ).drop("bf")
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)
