"""Full-registry timing sweep (optimization-round measurement tool).

Times EVERY registered batch query through the noop sink on a warm
session at the given sf (guide §1.4: noop computes every column of every
row, no driver collect) and writes one JSON map {name: seconds} — the
"measure first" evidence for the per-operator optimization checklist.

Streaming queries are skipped (they manage their own micro-batch
lifecycle; their cost is dominated by fixed trigger waits, not plan
work). Each job is labelled so a UI/event-log inspection can map stages
back to queries (guide §1.5).

Usage: python scripts/bench_sweep.py [sf_dir] [out_json] [name ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all
from stockmarketdata_dwb_etl_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bench_sweep.json"
    only = set(sys.argv[3:])

    load_all()
    spark = get_spark(app_name="bench-sweep")

    def run(name: str) -> float:
        spark.sparkContext.setJobDescription(f"sweep: {name}")
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        return dt

    # warm-up: JVM, codegen templates, parquet footers
    run("q_orderby_limit")
    run("q_agg_groupby")

    timings: dict[str, float] = {}
    for name in QUERIES:
        if only and name not in only:
            continue
        if name.startswith("q_stream_"):
            continue
        try:
            timings[name] = round(run(name), 3)
        except Exception as exc:  # noqa: BLE001
            timings[name] = -1.0
            print(f"FAIL {name}: {type(exc).__name__}: {str(exc)[:200]}")
        print(f"{name:32s} {timings[name]:7.3f}s", flush=True)

    with open(out, "w") as fh:
        json.dump(timings, fh, indent=1, sort_keys=True)
    done = [v for v in timings.values() if v >= 0]
    print(f"\n{len(done)} timed, total {sum(done):.1f}s -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
