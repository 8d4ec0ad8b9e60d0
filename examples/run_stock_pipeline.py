"""spark-submit entry point for the daily stock ETL (ref O1/O2).

Usage: spark-submit run_stock_pipeline.py <sf_dir> <out_dir>

Runs bronze→silver→gold with truncate-load semantics and post-load count
verification (ref dump_bigq.py:135-149), exiting non-zero on failure so
the orchestrator's retry policy sees it (the reference raises from its
PythonOperator for the same reason)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stock_etl/warehouse"

    from pyspark.sql import SparkSession

    from pipelines.stock_ingest import run_pipeline

    spark = SparkSession.builder.appName("stock-etl-daily").getOrCreate()
    counts = run_pipeline(spark, sf_dir, out_dir)
    print(f"pipeline counts: {counts}")
    if counts.get("gold", 0) <= 0:
        print("post-load verification FAILED: gold is empty", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
