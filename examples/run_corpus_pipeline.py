"""spark-submit entry point for the LLM corpus-curation pipeline.

Usage: spark-submit run_corpus_pipeline.py <sf_dir> <out_dir> [--near-dedup]

Materializes silver (canonical text + quality signals + split) / deduped /
gold layers as parquet under <out_dir> — the corpus twin of
run_stock_pipeline.py, exercising pipelines/corpus_curation.py end to end
with the same exit-nonzero-on-empty-gold contract so an orchestrator's
retry policy sees failures (the reference raises from its PythonOperator
for the same reason, stock_scraper_dag.py:10-42)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    out_dir = args[1] if len(args) > 1 else "/tmp/corpus_etl/warehouse"
    near_dedup = "--near-dedup" in sys.argv

    from pyspark.sql import SparkSession

    from pipelines.corpus_curation import run_pipeline

    spark = SparkSession.builder.appName("corpus-curation").getOrCreate()
    gold = run_pipeline(spark, sf_dir, out_dir, near_dedup=near_dedup)
    rows = gold.count()
    print(f"gold accounting rows: {rows}")
    if rows <= 0:
        print("post-load verification FAILED: gold is empty", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
