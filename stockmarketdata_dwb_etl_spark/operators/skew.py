"""Skew-mitigation operators: salted joins for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions — but it only works for
sort-merge joins and after the skewed shuffle files already exist. Salting
attacks the problem in the plan: the fact side spreads each hot key across
``n_salts`` sub-keys, the dim side replicates each row ``n_salts`` times,
and the join runs on (key, salt) with no single reducer owning a hot key.
Use when the dim side is too large to broadcast and a handful of keys carry
a disproportionate share of the fact rows (the classic web-log / null-key /
default-value skew of a 100 TB fact table).

Cost model: dim is replicated ×n_salts (choose n_salts ≈ hot-key partition
multiplier, not CPU count) — the fact side, which dominates at scale, is
never replicated and shuffles exactly once, same as the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_source: Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⨝ dim`` on ``key``, salted ``n_salts`` ways.

    ``salt_source`` is any deterministic per-row expression on the fact
    side with enough variety to spread a hot key (e.g. a line number or a
    hash of non-key columns) — NOT rand(), so the plan stays replayable
    and speculative task retries stay consistent.

    Only ``how`` in {"inner", "left", "left_semi", "left_anti"} is
    supported: those preserve fact rows, and every fact row carries
    exactly one salt while the dim replica set covers every salt value,
    so results are exactly ``fact.join(dim, key, how)``. Dim-preserving
    joins (right/full) are rejected — each unmatched dim row would be
    emitted once per salt replica (n_salts duplicates); salt the other
    side or use AQE skew handling instead.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti", "semi", "anti"):
        raise ValueError(
            f"salted_join supports fact-preserving joins only, got how={how!r}: "
            "a dim-preserving join would emit each unmatched dim row once per "
            "salt replica"
        )
    fact_s = fact.withColumn("__salt", F.pmod(F.xxhash64(salt_source), F.lit(n_salts)))
    dim_s = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(n_salts)]))
    )
    return fact_s.join(dim_s, [key, "__salt"], how).drop("__salt")
