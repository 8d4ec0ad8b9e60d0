"""SparkSession factory with scale-appropriate defaults.

Every entry point (tests, bench, driver) goes through :func:`get_spark` so
AQE, shuffle sizing, Arrow exchange and the UTC session timezone are applied
uniformly. On a real cluster the same builder applies — only ``master`` and
memory sizing change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "stockmarketdata-dwb-etl-spark",
    cpus: str | int | None = None,
    shuffle_partitions: str | int | None = None,
) -> SparkSession:
    """Create (or reuse) the engine SparkSession.

    Defaults follow the 100 TB posture scaled down to local mode:
    - AQE on (runtime join-strategy switching, skew splitting, partition
      coalescing) — the engine relies on it instead of hand-tuned plans.
    - ``spark.sql.shuffle.partitions`` sized to the local core count; on a
      cluster this is AQE-coalesced anyway.
    - Arrow enabled for every pandas_udf / toPandas exchange.
    - Session timezone pinned to UTC so timestamp semantics match the
      DuckDB oracle and are stable across hosts.
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = str(shuffle_partitions or os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", shuffle_partitions)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Older events.parquet vintages stored TIMESTAMP(NANOS) which Spark
        # cannot read as a timestamp; read as raw nanos and convert in
        # catalog.load_table (a no-op for the current MICROS-naive fixture).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # Hash-analytics posture: when a join can't broadcast, prefer
        # shuffled-hash over sort-merge — the probe's ×30 TPC-H Q3 (the
        # first point where the filtered orders side outgrows the
        # broadcast threshold) measured 6.0 s SMJ vs 5.1-5.8 s SHJ warm
        # (14.1 vs 6.8 cold): SHJ skips sorting the 180M-row fact side.
        # AQE's skew handling still applies, and Spark 3+ SHJ spills.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # Split/pack granularity sized to the test scale factor (SURVEY §2B
        # scale posture: size maxPartitionBytes to the SF). At the default
        # 128m, Spark PACKS every small fixture file into 1-2 input
        # partitions and single-threads the scan stage (measured: ~30%
        # slower battery at sf0.1). 8m keeps files in separate partitions
        # locally; a production 100 TB deployment overrides back to 128m+
        # via SPARK_GRAFT_MAX_PARTITION_BYTES.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(8 * 1024 * 1024)),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
