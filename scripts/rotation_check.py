"""Check that the registry PRIORITY front-50 still points at queries
with no driver evidence.

The external driver evaluates the FIRST ~50 registry entries each round;
if they already have green CORRECTNESS_r*.json rows, the round's
evidence budget re-tests known-good queries and the cumulative count
stalls (this happened in round 5). Run this at round start; rotate
registry.PRIORITY when it reports stale entries.

Usage: python scripts/rotation_check.py [n_front]
Exit status: 0 when the front block is fully fresh, 1 otherwise.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_front = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    green: set[str] = set()
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        for name, row in json.load(open(path)).items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                green.add(name)

    from stockmarketdata_dwb_etl_spark.registry import PRIORITY, QUERIES, load_all

    load_all()
    front = list(PRIORITY[:n_front])
    stale = [q for q in front if q in green]
    never = [q for q in QUERIES if q not in green]

    print(f"driver-green cumulative: {len(green)}/{len(QUERIES)}")
    print(f"never-driver-tested:     {len(never)}")
    print(f"front-{n_front} stale (already green): {len(stale)}")
    if stale:
        print("  " + " ".join(stale))
        print(
            "ROTATE: move the stale names out of the front block and "
            "promote the next never-tested tranche (re-budget at sf0.01, "
            "cheapest-first, <=3 streaming; see registry.PRIORITY notes)"
        )
        return 1
    print("front block is fully fresh — no rotation needed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
