"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced through the noop sink (full distributed execution, no
driver-side collect — the honest way to time a plan). One untimed warm-up
run of a small query absorbs JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q_agg_groupby",
    "q_agg_distinct",
    "q_join_broadcast",
    "q_join_inner",
    "q_join_asof",
    "q_window_rank",
    "q_window_moving_avg",
    "q_topk_per_group",
    "q_orderby_limit",
    "q_pivot",
    "q_dedup_exact",
    "q_tokenize_wordcount",
    "q_cosine_topk",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_dedup_minhash",
    "q_window_range_frame",
    "q_agg_percentile",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from stockmarketdata_dwb_etl_spark.operators.cache import clear_slots
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all
    from stockmarketdata_dwb_etl_spark.session import get_spark

    load_all()
    spark = get_spark(app_name="bench")

    def run(name: str) -> float:
        # Cold-slot discipline (r12 verdict #1): bounded_persist's
        # sameSemantics reuse would hand repeat N the intermediate repeat
        # N-1 persisted (e.g. the dedup shingle table), so steady() would
        # time a run that skips rebuilding it. Clearing the slots BEFORE
        # the timer starts makes every timed run compute from the parquet
        # inputs alone; the unpersist itself stays outside the timing.
        clear_slots()
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    run("q_orderby_limit")  # warm-up: JVM, codegen, parquet footer cache

    # Fixed calibration probe (VERDICT r06 #6): the same code measured a
    # 9.4-13.4 s battery-total spread across identical-code runs, so a
    # round's total can't be read raw. q_orderby_limit (scan + TakeOrdered,
    # plan unchanged since round 1) best-of-3 AFTER warm-up captures the
    # machine state of this run; normalize any cross-round comparison by
    # the ratio of machine_state values before concluding a regression.
    pre = min(run("q_orderby_limit") for _ in range(3))

    # Converge-to-plateau: steady-state throughput, not first-run plan
    # compilation. Two runs minimum; while the latest run still improves
    # on the best by >20% the JIT is mid-tier-up, so keep going (cap 6).
    # On a warm JVM this is exactly the old best-of-2; on the r10 VM the
    # giant minhash codegen method needed ~6 executions to reach C2
    # steady state (12.5 s first run -> 1.65 s plateau, same code that
    # benched 1.68 s in r09), and best-of-2 was recording warm-up — the
    # wrong quantity for a 100 TB stage where tier-up amortizes to zero.
    def steady(name: str) -> float:
        best = min(run(name), run(name))
        for _ in range(4):
            t = run(name)
            improved = t < best * 0.8
            best = min(best, t)
            if not improved:
                break
        return round(best, 3)

    timings = {name: steady(name) for name in HEADLINE}

    # the probe query re-runs inside the battery fully warm; take the
    # overall best so early-JVM jitter can't inflate the marker
    machine_state = round(min(pre, timings["q_orderby_limit"]), 3)

    # Cross-round normalization (VERDICT r10 #3): the probe plan has been
    # frozen since round 1, so machine_state differences between rounds
    # are pure VM speed. BASELINE_PROBE is the round-9 VM's probe value —
    # the machine the rotation-plan timings were calibrated on; the r10
    # VM read 0.273 (1.59x slower) and its raw 12.162 s battery was a
    # false regression. value_normalized = value * BASELINE_PROBE /
    # machine_state is the number to compare across rounds.
    BASELINE_PROBE = 0.172
    value_normalized = (
        round(sum(timings.values()) * BASELINE_PROBE / machine_state, 3)
        if machine_state > 0
        else None
    )

    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_query_battery_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "machine_state": machine_state,
                "baseline_probe": BASELINE_PROBE,
                "value_normalized": value_normalized,
            }
        )
    )


if __name__ == "__main__":
    main()
