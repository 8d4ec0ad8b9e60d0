"""Fixture-table catalog: load the driver-generated parquet tables.

The reference materializes one warehouse table with an explicit schema
(``/root/reference/dump_bigq.py:47-56``); our engine generalizes that to a
catalog of parquet-backed tables addressed by a scale-factor directory so
the identical plan runs at any scale (TESTDATA.md).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Parquet scan → columnar vectorized read;
    Catalyst pushes filters/projections into the scan.

    ``events.ts`` is canonically TIMESTAMP_NTZ: the fixture stores naive
    micros (parquet TIMESTAMP(MICROS, isAdjustedToUTC=false)), which both
    Spark (as NTZ) and DuckDB (as naive TIMESTAMP) read with identical
    wall-clock semantics under ANY session timezone. Older fixture vintages
    stored TIMESTAMP(NANOS); for those the legacy conf scans raw nanos and
    the fallback below truncates to micros on a naive epoch — same
    canonical type either way.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # Runtime-settable SQL conf: works under ANY caller-provided session,
        # not just the one session.py builds (the external driver passes its
        # own vanilla SparkSession). A no-op for the MICROS fixture vintage.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # NANOS vintage: truncate to micros on the naive epoch (NTZ), the
        # session-timezone-independent equivalent of DuckDB's read.
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
