"""Dump .explain('formatted') output for named queries to files.

Usage: python scripts/plan_dump.py <out_dir> <suffix> [sf_dir] -- name...
Writes <out_dir>/<name>_<suffix>.txt per query (the optimization-round
plan evidence: judge checks plan claims against these files).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all
from stockmarketdata_dwb_etl_spark.session import get_spark


def main() -> int:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    sep = sys.argv.index("--")
    sf_dir = sys.argv[3] if sep > 3 else "/root/testdata/sf0.1"
    names = sys.argv[sep + 1 :]

    os.makedirs(out_dir, exist_ok=True)
    load_all()
    spark = get_spark(app_name="plan-dump")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} @ {sf_dir} ({suffix})\n")
            fh.write(plan)
        print(f"wrote {path} ({plan.count(chr(10))} lines)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
