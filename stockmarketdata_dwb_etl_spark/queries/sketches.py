"""Mergeable-sketch rollup surface: pre-aggregated approximate distincts.

The pattern that makes 100 TB dashboards cheap: compute a small mergeable
sketch per fine-grained bucket ONCE, then answer every coarser-grained
distinct question by merging sketches — never re-scanning the facts. The
reference's daily warehouse reload (/root/reference/dump_bigq.py:135-149)
is the fine-grained bucket here; the engine adds the rollup algebra
BigQuery would otherwise provide (HLL_COUNT.MERGE)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockmarketdata_dwb_etl_spark.functions.exact import portable_round
from stockmarketdata_dwb_etl_spark.catalog import load_table
from stockmarketdata_dwb_etl_spark.registry import query

#: Floor on the freqItems support argument: the candidate pass collects
#: up to 1/support items to the driver, so the floor caps driver-side
#: state at ~112 candidates (1 / (0.01 * 0.9)) regardless of key
#: cardinality. A caller wanting rarer heavy hitters should raise the
#: pass-2 threshold, not lower pass 1 below the bound.
_FREQ_SUPPORT_FLOOR = 0.01


def _freq_item_candidates(df: DataFrame, col: str, support: float) -> list:
    """Pass-1 candidate heavy hitters via ``df.stat.freqItems`` with the
    bounded-driver-state invariant ENFORCED: support below
    ``_FREQ_SUPPORT_FLOOR`` would collect more than 1/floor items to the
    driver, so it raises instead of silently degrading.

    freqItems only guarantees items with share STRICTLY ABOVE its
    support argument; probe at 0.9x so an item sitting exactly at the
    >= boundary still reaches pass 2's exact filter."""
    if support < _FREQ_SUPPORT_FLOOR:
        raise ValueError(
            f"freqItems support {support} below floor {_FREQ_SUPPORT_FLOOR}:"
            " the candidate collect would exceed the bounded-driver-state"
            " invariant (1/support items)"
        )
    return list(df.stat.freqItems([col], support * 0.9).collect()[0][0])


@query(
    "q_sketch_rollup",
    oracle="""
    SELECT date_trunc('week', ts) AS week,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS est_within_5pct
    FROM events
    GROUP BY date_trunc('week', ts)
    """,
)
def q_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch rollup: per-DAY Apache DataSketches HLL sketches of
    user_id (hll_sketch_agg, lgK=14), merged up to WEEK with
    hll_union_agg and estimated — distinct-users-per-week answered from
    ~16 KB daily sketches instead of a fact re-scan. The estimate is
    checked against the exact per-week distinct (computed via the
    scale-safe two-phase dedup-then-count); the emitted row carries the
    deterministic |est − exact|/exact ≤ 5% verdict, which at lgK=14
    (rse ≈ 0.8%) always holds.

    Scale: the daily sketch layer is what a 100 TB warehouse would
    materialize incrementally (one sketch row per day-partition as it
    lands); every week/month/year rollup is then a merge over rows
    proportional to DAYS, not events."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    week = F.date_trunc("week", F.col("day")).alias("week")
    daily = ev.select(day, "user_id").groupBy("day").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    weekly_est = daily.select(week, "sk").groupBy("week").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users")
    )
    exact = (
        ev.select(F.date_trunc("week", F.col("ts")).alias("week"), "user_id")
        .distinct()
        .groupBy("week")
        .agg(F.count(F.lit(1)).alias("exact_users"))
    )
    return exact.join(F.broadcast(weekly_est), "week").select(
        "week",
        "exact_users",
        (
            F.abs(F.col("est_users") - F.col("exact_users"))
            / F.col("exact_users")
            <= 0.05
        ).alias("est_within_5pct"),
    )


@query(
    "q_heavy_hitters",
    oracle="""
    WITH tot AS (SELECT COUNT(*) AS n FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST((CAST(floor(CAST((COUNT(*) / (SELECT CAST(n AS DOUBLE) FROM tot)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0)
                AS DOUBLE) AS share
    FROM events
    GROUP BY event_type
    HAVING COUNT(*) >= 0.15 * (SELECT n FROM tot)
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass heavy hitters: sketch candidate pass + exact verify pass.

    Pass 1 runs ``df.stat.freqItems`` (the Karp–Papadimitriou–Shenker
    streaming majority algorithm, distributed as a Spark aggregate of
    1/support-bounded counter maps) to get CANDIDATE items with share ≥
    support — guaranteed NO false negatives, possible false positives.
    Pass 2 exactly counts ONLY the candidates (an isin filter that pushes
    into the scan) and keeps those truly above threshold, so the final
    answer is exact and deterministic — the oracle's plain GROUP BY /
    HAVING.

    Scale: the fixture column is small-cardinality, but the shape is the
    100 TB one — pass 1's state is bounded by 1/support counters per
    partition (never by key cardinality), so the same two passes find
    heavy hitters over billion-key domains where a full GROUP BY of pass 2
    alone would shuffle every key; pass 2's shuffle carries only rows
    matching ~1/support candidate keys."""
    ev = load_table(spark, sf_dir, "events")
    support = 0.15
    candidates = _freq_item_candidates(ev, "event_type", support)
    total = ev.count()
    return (
        ev.filter(F.col("event_type").isin(candidates))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .filter(F.col("n_events") >= support * total)
        .select(
            "event_type",
            "n_events",
            portable_round(F.col("n_events") / F.lit(float(total)), 4).alias("share"),
        )
    )
