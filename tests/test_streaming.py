"""Batch ≡ stream equivalence (SURVEY.md §5.4): the same windowed
aggregation computed over the full batch and over the replayed file stream
must converge to identical final state."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.compare import canon_frame
from tests.conftest import SF_DIR


def test_tumbling_batch_equals_stream(spark):
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all
    from stockmarketdata_dwb_etl_spark.streaming.jobs import (
        prepare_event_chunks,
        read_events_stream,
        run_stream_to_parquet,
    )

    load_all()
    batch = QUERIES["q_tumbling_window"](spark, SF_DIR).toPandas()

    chunks = prepare_event_chunks(spark, SF_DIR)
    stream = read_events_stream(spark, chunks)
    # No watermark + availableNow: every window is emitted when the replay
    # drains, so the final state must equal the batch answer exactly.
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(38,6)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.trigger(availableNow=True)
        .outputMode("complete")
        .format("memory")
        .queryName("tumbling_stream_state")
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM tumbling_stream_state").toPandas()
    assert canon_frame(got) == canon_frame(batch)


def test_stream_dedup_exact_once(spark):
    from stockmarketdata_dwb_etl_spark.catalog import load_table
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all

    load_all()
    n_events = load_table(spark, SF_DIR, "events").count()
    deduped = QUERIES["q_stream_dedup"](spark, SF_DIR)
    assert deduped.count() == n_events
    assert deduped.select("event_id").distinct().count() == n_events


def test_foreachbatch_merge_equals_batch(spark):
    """The incremental foreachBatch snapshot (fed every event twice) must
    equal the batch events table exactly once per key."""
    from pyspark.sql import functions as F

    from stockmarketdata_dwb_etl_spark.catalog import load_table
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all

    load_all()
    got = QUERIES["q_stream_foreachbatch"](spark, SF_DIR)
    ev = load_table(spark, SF_DIR, "events")
    assert got.count() == ev.count()
    assert got.select(F.countDistinct("event_id")).first()[0] == ev.count()
    # spot-check content equality on a deterministic projection
    a = sorted((r.event_id, r.user_id, r.event_type) for r in got.collect())
    b = sorted(
        (r.event_id, r.user_id, r.event_type)
        for r in ev.select("event_id", "user_id", "event_type").collect()
    )
    assert a == b


def test_foreachbatch_merge_arrivals_win(spark, tmp_path):
    """A replayed key carrying a CHANGED value must end with the arriving
    value — the left_anti merge guarantees arrivals beat stale snapshot
    rows (a plain union+dropDuplicates keeps an arbitrary row)."""
    import os

    from stockmarketdata_dwb_etl_spark.streaming.jobs import (
        EVENTS_SCHEMA,
        run_stream_incremental_merge,
    )

    src = str(tmp_path / "chunks")
    rows1 = [(1, "2024-01-01 00:00:00", 10, "click", 1.0, None),
             (2, "2024-01-01 00:01:00", 11, "view", 2.0, None)]
    rows2 = [(2, "2024-01-01 00:01:00", 11, "view", 99.0, None),  # update!
             (3, "2024-01-01 00:02:00", 12, "click", 3.0, None)]
    for i, rows in enumerate((rows1, rows2)):
        df = spark.createDataFrame(
            [(a, __import__("datetime").datetime.fromisoformat(b), c, d, e, f)
             for a, b, c, d, e, f in rows],
            EVENTS_SCHEMA,
        )
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/b{i}")
        # one file per dir; stream the parent with one file per trigger
    # flatten the part files into src with ordered mtimes
    import glob
    import shutil

    for i in range(2):
        part = glob.glob(f"{src}/b{i}/part-*")[0]
        dst = f"{src}/chunk{i}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (1_600_000_000 + i, 1_600_000_000 + i))
        shutil.rmtree(f"{src}/b{i}")

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    snap = run_stream_incremental_merge(
        stream.select("event_id", "ts", "user_id", "event_type", "value"),
        "merge_arrivals_win_test",
        ["event_id"],
    )
    got = {r.event_id: r.value for r in spark.read.parquet(snap).collect()}
    assert got == {1: 1.0, 2: 99.0, 3: 3.0}


def test_partitioned_merge_equals_batch(spark):
    """The partitioned incremental snapshot (every event twice, dynamic
    partition overwrite) must equal the batch events table."""
    from pyspark.sql import functions as F

    from stockmarketdata_dwb_etl_spark.catalog import load_table
    from stockmarketdata_dwb_etl_spark.registry import QUERIES, load_all

    load_all()
    got = QUERIES["q_stream_merge_partitioned"](spark, SF_DIR)
    ev = load_table(spark, SF_DIR, "events")
    assert got.count() == ev.count()
    assert got.select(F.countDistinct("event_id")).first()[0] == ev.count()


def test_streaming_agg_on_rocksdb_state_store(spark, tmp_path):
    """The 100 TB state path: the same windowed aggregation must run and
    agree with batch under the RocksDB state-store provider (disk-backed,
    bounded-heap state — what a production deployment uses for state that
    outgrows executor memory). Provider is scoped to this query's
    checkpoint; the session conf is restored after."""
    import os

    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    spark.range(1000).selectExpr(
        "id", "id % 13 as k", "timestamp_micros(cast(id*60000000 as long)) as ts"
    ).write.mode("overwrite").parquet(src)

    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema("id long, k long, ts timestamp").parquet(src)
        agg = stream.withWatermark("ts", "10 minutes").groupBy("k").count()
        q = (
            agg.writeStream.trigger(availableNow=True)
            .outputMode("complete")
            .format("memory")
            .queryName("rocksdb_counts")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination()
        got = {
            r.k: r["count"]
            for r in spark.sql("SELECT * FROM rocksdb_counts").collect()
        }
    finally:
        if old:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    want = {
        r.k: r["count"]
        for r in spark.read.parquet(src).groupBy("k").count().collect()
    }
    assert got == want
