"""Round-11 hardening tests: the bounded-driver-state guard on the
freqItems candidate pass and the determinism fixes from the r10 advice
(order-independent IPF/Shapley/GESD moment sums)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def test_freq_item_support_floor_enforced(spark):
    """_freq_item_candidates must REFUSE a support below the floor: the
    candidate collect is bounded by 1/support items, and the guard is
    the invariant, not the caller's good manners."""
    from stockmarketdata_dwb_etl_spark.catalog import load_table
    from stockmarketdata_dwb_etl_spark.queries.sketches import (
        _FREQ_SUPPORT_FLOOR,
        _freq_item_candidates,
    )

    ev = load_table(spark, SF_DIR, "events")
    with pytest.raises(ValueError, match="bounded-driver-state"):
        _freq_item_candidates(ev, "event_type", _FREQ_SUPPORT_FLOOR / 2)
    # at the floor it runs and returns a bounded list
    cands = _freq_item_candidates(ev, "event_type", 0.15)
    assert 0 < len(cands) <= 1 / (0.15 * 0.9) + 1


def test_raking_weights_margins_hit(spark):
    """After two IPF rounds the segment margins are exact by
    construction (the last scaling): rel_err must be ~0 and the achieved
    totals must equal the targets at the emitted 4dp."""
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["q_raking_weights"](spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["rel_err"] == pytest.approx(0.0, abs=1e-6)
        assert r["achieved_n"] == pytest.approx(r["target_n"], abs=1e-3)
        assert r["min_weight"] > 0


def test_shapley_phi_sums_to_grand_value(spark):
    """Shapley efficiency axiom: Σ_channels φ = v(grand) − v(∅); with
    v(∅) folded into the terms the per-channel φs must reconstruct
    v_grand − v_empty at the emitted rounding."""
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["q_shapley_attribution"](spark, SF_DIR).collect()
    assert len(rows) == 4
    v_grand = rows[0]["v_grand"]
    # v(∅) = conversion rate of journeys touching no channel — recompute
    # cheaply: phi sums to v_grand - v_empty, and every |phi| <= 1
    total_phi = sum(r["shapley_phi"] for r in rows)
    assert abs(total_phi) <= 1.0 + 1e-9
    assert 0.0 <= v_grand <= 1.0
    # efficiency: v_empty = v_grand - total_phi must be a valid rate
    assert -1e-6 <= v_grand - total_phi <= 1.0 + 1e-6


def test_esd_outliers_recomputes_moments(spark):
    """GESD must emit exactly _ESD_ROUNDS rows per symbol with
    non-increasing R across rounds impossible to guarantee in general,
    but rounds must be 1..N with distinct suspect days per symbol (the
    removal actually removed)."""
    from collections import defaultdict

    from stockmarketdata_dwb_etl_spark.queries.dataops13 import _ESD_ROUNDS
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["q_esd_outliers"](spark, SF_DIR).collect()
    per_sym = defaultdict(list)
    for r in rows:
        per_sym[r["symbol"]].append(r)
    for sym, rs in per_sym.items():
        assert [r["round"] for r in rs] == list(range(1, _ESD_ROUNDS + 1))
        days = [r["suspect_day"] for r in rs]
        assert len(set(days)) == len(days), f"{sym}: suspect repeated"
