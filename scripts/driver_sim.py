"""Simulate the driver's verify flow end-to-end against __spark_entry__:
smoke entry(), then run every queries() entry at the given sf and compare
with oracle_sql() via DuckDB (row count + columns + order-insensitive
values; tests/compare.py canonicalizes floats at 9dp and REJECTS nested
top-level output columns — deliberately STRICTER than the external
driver's hash, per the r08 verdict).

Usage: python scripts/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from tests.compare import assert_frames_match


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as ent
    from pyspark.sql import SparkSession
    from stockmarketdata_dwb_etl_spark.catalog import TABLES

    # Deliberately a VANILLA session (not session.get_spark): the external
    # driver passes its own SparkSession, so any dependency on our builder
    # confs is a bug this sim must catch (see ADVICE r1: nanosAsLong).
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "32")
        # sizing, not semantics: Spark's 1g driver-memory DEFAULT is a
        # misconfiguration for a 32-thread local JVM on a 128 GiB box —
        # the full sf0.1 battery heap-OOMs under it. The semantic confs
        # stay vanilla (the point of this sim).
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )

    t0 = time.time()
    smoke = ent.entry(spark)
    smoke_rows = smoke.collect()
    print(f"SMOKE entry(): {len(smoke_rows)} rows, schema={smoke.schema.simpleString()[:120]} "
          f"({time.time()-t0:.1f}s)")
    assert len(smoke_rows) > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = ent.queries(), ent.oracle_sql()
    n_pass = n_fail = 0
    # registry insertion order == the order the external driver runs them
    for name in qs:
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = qs[name](spark, sf_dir).toPandas()
            if name in oracles:
                oracle_pdf = con.execute(oracles[name]).fetchdf()
                assert_frames_match(spark_pdf, oracle_pdf, name)
                status = f"OK    rows={len(spark_pdf)}"
            else:
                assert spark_pdf.shape[1] > 0
                status = f"ROWS  rows={len(spark_pdf)} (no oracle)"
            n_pass += 1
        except Exception as exc:  # noqa: BLE001
            status = f"FAIL  {type(exc).__name__}: {str(exc)[:300]}"
            n_fail += 1
        print(f"{name:28s} {status}  ({time.time()-t0:.1f}s)")

    print(f"\n{n_pass} passed, {n_fail} failed at {sf_dir}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
