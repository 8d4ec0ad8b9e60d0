"""Bounded single-slot persistence for multi-consumed intermediates.

A DataFrame consumed by several downstream branches re-executes its whole
pipeline once per branch unless materialized. ``persist()`` fixes that,
but a battery/probe session that runs many such queries back-to-back
accumulates persisted tables until LRU eviction, and the eviction/GC
pressure lands on whatever query runs LAST (measured on the dedup
shingle tables: q_dedup_cross_corpus probed 6.6 s at ×10 as probe 16/18
of a leaky session vs 3.0 s on a clean JVM — see operators/dedup.py).

``bounded_persist`` keeps AT MOST ONE live persisted table per named
slot: persisting into a slot unpersists the slot's previous occupant.
Queries are self-contained (each call rebuilds), so the slot guarantees
a bounded cache footprint across an arbitrarily long session while still
collapsing within-query re-execution.

Unlike ``localCheckpoint``, persistence keeps the full lineage visible
in the executed plan (InMemoryRelation wraps the subtree), so plan
audits and plan-shape tests still see the real join/aggregate structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: dict[str, DataFrame] = {}


def clear_slots() -> None:
    """Unpersist every live slot. A benchmark that repeats a query to
    reach steady state must call this between repeats: ``bounded_persist``'s
    sameSemantics reuse would otherwise hand repeat N the slot persisted by
    repeat N-1, so the timed run skips rebuilding the intermediate — the
    measured time would exclude work every cold execution pays."""
    for slot in list(_LIVE):
        try:
            _LIVE[slot].unpersist()
        except Exception:  # noqa: BLE001 — session may be gone
            pass
        del _LIVE[slot]


def bounded_persist(df: DataFrame, slot: str) -> DataFrame:
    """Persist ``df`` in ``slot``, unpersisting the slot's previous DF.

    If the slot already holds a SEMANTICALLY IDENTICAL plan (same query
    over the same fixture — e.g. the five graph queries all building the
    same basket/edge tables), the cached DataFrame is returned as-is:
    churning the slot would drop a warm cache the next query immediately
    rebuilds. A different plan (other query, other sf_dir, regenerated
    fixture) still evicts the previous occupant."""
    prev = _LIVE.get(slot)
    if prev is not None:
        try:
            if prev.sameSemantics(df):
                return prev
        except Exception:  # noqa: BLE001 — sessions may differ; fall through
            pass
        try:
            prev.unpersist()
        except Exception:  # noqa: BLE001 — previous session may be gone
            pass
        del _LIVE[slot]
    _LIVE[slot] = df.persist()
    return df
