"""Timeseries battery round 3: batch gap-sessionization, Bollinger bands
(rolling mean ± k·std with breach flags), and the forward-direction as-of
join.

These extend the market-data analytics surface of the reference's
post-load stage (/root/reference/dump_bigq.py:135-149 exists precisely so
analysts can run time-window shapes like these over the loaded history).
Determinism: timestamp arithmetic stays in exact integer microseconds;
frame sums go through the exact-decimal cast; the Pearson-style variance
combination uses the identical double op order on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stockmarketdata_dwb_etl_spark.functions.exact import portable_round
from stockmarketdata_dwb_etl_spark.catalog import load_table
from stockmarketdata_dwb_etl_spark.operators.asof import asof_join_forward
from stockmarketdata_dwb_etl_spark.registry import query

_DEC = "decimal(38,6)"
_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap, exact microseconds


@query(
    "q_sessionize_batch",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('microsecond', lag(ts) OVER w, ts)
                            > {_GAP_US}
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts, event_id,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(date_diff('microsecond', MIN(ts), MAX(ts)) AS BIGINT)
             AS duration_us
    FROM sessions
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
)
def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-based sessionization: a new session starts after a >30 min
    silence; sessions get per-user sequence numbers and (start, end, count,
    duration) stats — the batch counterpart of q_session_window's streaming
    session_window, and the classic cumulative-sum-of-flags formulation.
    Gap and duration arithmetic is exact integer microseconds (no
    truncating second-diff). Scales: two windows + one agg, all partitioned
    by user_id — a single shuffle, no self-join."""
    ev = load_table(spark, sf_dir, "events")
    wlag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.lag("ts").over(wlag).alias("__prev_ts"),
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("__prev_ts").isNull()
            | (
                F.expr("timestampdiff(MICROSECOND, __prev_ts, ts)")
                > F.lit(_GAP_US)
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.select(
        "user_id",
        "ts",
        "event_id",
        F.sum("new_session").over(wsum).alias("session_seq"),
    )
    return (
        sessions.groupBy("user_id", F.col("session_seq").cast("bigint").alias("session_seq"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
        .select(
            "user_id",
            "session_seq",
            "session_start",
            "session_end",
            "n_events",
            F.expr(
                "timestampdiff(MICROSECOND, session_start, session_end)"
            )
            .cast("bigint")
            .alias("duration_us"),
        )
        .orderBy("user_id", "session_seq")
    )


@query(
    "q_bollinger_bands",
    oracle="""
    WITH seq AS (
        SELECT event_type, event_id, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    sums AS (
        SELECT event_type, event_id, value, rn,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sx,
               CAST(SUM(CAST(value * value AS DECIMAL(38,6))) OVER w AS DOUBLE)
                 AS sxx
        FROM seq
        WINDOW w AS (PARTITION BY event_type ORDER BY rn
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, event_id, value,
           CAST((CAST(floor(CAST((sx / 20) AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS DOUBLE) AS ma20,
           CAST((CAST(floor(CAST((sx / 20 + 2 * (sqrt(20 * sxx - sx * sx) / 20)) AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0)
                AS DOUBLE) AS upper_band,
           CAST((CAST(floor(CAST((sx / 20 - 2 * (sqrt(20 * sxx - sx * sx) / 20)) AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0)
                AS DOUBLE) AS lower_band,
           CAST(value > sx / 20 + 2 * (sqrt(20 * sxx - sx * sx) / 20)
                AS BOOLEAN) AS breach_upper
    FROM sums WHERE rn >= 20
    ORDER BY event_type, event_id
    """,
)
def q_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands: 20-observation rolling mean ± 2 population std per
    event_type, with an upper-breach flag — the volatility-envelope
    indicator over the market-event stream. Frame sums are exact-decimal;
    the mean/std combination runs in double with the IDENTICAL expression
    tree on both engines (sqrt(20·sxx − sx²)/20), so the 6dp round and the
    breach comparison agree bit-for-bit. Scales: one ordered window per
    type, O(1) state per row, no self-join."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        "event_id",
        "value",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("ts", "event_id"))
        .alias("rn"),
    )
    w = Window.partitionBy("event_type").orderBy("rn").rowsBetween(-19, 0)
    sums = seq.select(
        "event_type",
        "event_id",
        "value",
        "rn",
        F.sum(F.col("value").cast(_DEC)).over(w).cast("double").alias("sx"),
        F.sum((F.col("value") * F.col("value")).cast(_DEC))
        .over(w)
        .cast("double")
        .alias("sxx"),
    ).filter(F.col("rn") >= 20)
    ma = F.col("sx") / 20
    sd = F.sqrt(F.lit(20) * F.col("sxx") - F.col("sx") * F.col("sx")) / 20
    upper = ma + 2 * sd
    lower = ma - 2 * sd
    return sums.select(
        "event_type",
        "event_id",
        "value",
        portable_round(ma, 6).cast("double").alias("ma20"),
        portable_round(upper, 6).cast("double").alias("upper_band"),
        portable_round(lower, 6).cast("double").alias("lower_band"),
        (F.col("value") > upper).alias("breach_upper"),
    ).orderBy("event_type", "event_id")


@query(
    "q_join_asof_forward",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, event_id, CAST((CAST(floor(CAST((value) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS value
        FROM events WHERE event_type = 'click'
    ), purchases AS (
        SELECT user_id, ts AS next_purchase_ts, event_id AS next_purchase_id
        FROM events WHERE event_type = 'purchase'
    )
    SELECT c.user_id, c.ts, c.event_id, c.value,
           p.next_purchase_id, p.next_purchase_ts
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts <= p.next_purchase_ts
    """,
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each click matched to the user's NEXT purchase
    at or after it — conversion-attribution's "time to next purchase"
    shape (operators/asof.py::asof_join_forward — union + descending
    window, shuffle-once; cited parity target: DuckDB ASOF JOIN with
    l.ts <= r.ts, pandas merge_asof(direction='forward'))."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", portable_round("value", 4).alias("value")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("ts").alias("next_purchase_ts"),
        F.col("event_id").alias("next_purchase_id"),
    )
    return asof_join_forward(
        clicks,
        purchases,
        key_cols=["user_id"],
        ts_col="ts",
        right_payload=["next_purchase_id", "next_purchase_ts"],
    )


@query(
    "q_cusum_changepoint",
    oracle="""
    WITH base AS (
        SELECT event_type, event_id, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    target AS (
        SELECT event_type,
               CAST((CAST(floor(CAST((CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                          / COUNT(*)) AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS DOUBLE) AS mu
        FROM base GROUP BY event_type
    ),
    pfx AS (
        SELECT b.event_type, b.event_id, b.rn,
               SUM(CAST(b.value - t.mu AS DECIMAL(38,6)))
                 OVER (PARTITION BY b.event_type ORDER BY b.rn
                       ROWS UNBOUNDED PRECEDING) AS p
        FROM base b JOIN target t ON t.event_type = b.event_type
    ),
    cusum AS (
        -- least(0, ...) adds the implicit empty prefix P_0 = 0: without
        -- it a series drifting up from its first observation would
        -- report S_1 = 0 instead of P_1
        SELECT event_type, event_id, rn,
               p - least(CAST(0 AS DECIMAL(38,6)),
                         MIN(p) OVER (PARTITION BY event_type ORDER BY rn
                                      ROWS UNBOUNDED PRECEDING)) AS s
        FROM pfx
    )
    SELECT event_type, event_id, rn,
           CAST((CAST(floor(CAST((CAST(s AS DOUBLE)) AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS DOUBLE) AS cusum_stat
    FROM cusum
    WHERE CAST(s AS DOUBLE) > 500.0
    ORDER BY event_type, rn
    """,
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change detection per event_type: flag observations
    where the cumulative drift above the series mean exceeds the decision
    threshold. The textbook recurrence S_i = max(0, S_{i-1} + x_i − μ) is
    NOT window-expressible — but it equals P_i − min(0, min_{j≤i} P_j)
    for the prefix sums P of (x − μ) (the 0 is the empty prefix P_0,
    validated against the sequential recurrence in
    tests/test_round3_ops.py), so the engine computes it with TWO stacked
    windows (running decimal sum, then running min) instead of a
    sequential pandas recurrence: stays JVM-side, one shuffle, O(1) state
    per row. Prefix sums accumulate in exact DECIMAL so the running min
    and the threshold compare are order-independent; μ is the exact-
    decimal 6dp-rounded mean broadcast per type."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        "event_id",
        "value",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("ts", "event_id"))
        .alias("rn"),
    )
    target = base.groupBy("event_type").agg(
        portable_round(
            F.sum(F.col("value").cast(_DEC)).cast("double") / F.count(F.lit(1)), 6
        )
        .cast("double")
        .alias("mu")
    )
    wrun = (
        Window.partitionBy("event_type")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pfx = base.join(F.broadcast(target), "event_type").select(
        "event_type",
        "event_id",
        "rn",
        F.sum((F.col("value") - F.col("mu")).cast(_DEC)).over(wrun).alias("p"),
    )
    # least(0, running_min) = the implicit empty prefix P_0 = 0, so the
    # identity matches the textbook recurrence from the first row
    cusum = pfx.select(
        "event_type",
        "event_id",
        "rn",
        (
            F.col("p")
            - F.least(F.lit(0).cast(_DEC), F.min("p").over(wrun))
        ).alias("s"),
    )
    return (
        cusum.filter(F.col("s").cast("double") > 500.0)
        .select(
            "event_type",
            "event_id",
            "rn",
            portable_round(F.col("s").cast("double"), 6).cast("double").alias("cusum_stat"),
        )
        .orderBy("event_type", "rn")
    )


_OVERLAP_US = 30 * 60 * 1_000_000  # 30-minute interval width


def interval_overlap_pairs(a: DataFrame, b: DataFrame) -> DataFrame:
    """The interval-overlap join core: equi-join on user_id with the
    overlap condition as a residual filter, overlap length in exact
    integer microseconds. ``a`` carries (user_id, click_id, a_start,
    a_end); ``b`` carries (b_user, purchase_id, b_start, b_end).

    Skew posture (asserted in tests/test_plans.py): this is a sort-merge
    join on the user key, so a hot user falls to AQE's OptimizeSkewedJoin
    — the oversized partition is split by map-output blocks (mid-key
    splits are fine for SMJ: each left split joins the replicated right
    partition), so per-TASK pair expansion is bounded by
    (hot_rows / n_splits) x right_rows instead of the full n_a x n_b
    landing on one task."""
    return a.join(
        b,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("a_start") < F.col("b_end"))
        & (F.col("b_start") < F.col("a_end")),
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        F.expr(
            "timestampdiff(MICROSECOND, greatest(a_start, b_start),"
            " least(a_end, b_end))"
        )
        .cast("bigint")
        .alias("overlap_us"),
    )


@query(
    "q_interval_overlap",
    oracle=f"""
    WITH a AS (
        SELECT user_id, event_id AS click_id, ts AS a_start,
               ts + INTERVAL 30 MINUTE AS a_end
        FROM events WHERE event_type = 'click'
    ),
    b AS (
        SELECT user_id, event_id AS purchase_id, ts AS b_start,
               ts + INTERVAL 30 MINUTE AS b_end
        FROM events WHERE event_type = 'purchase'
    )
    SELECT a.user_id, a.click_id, b.purchase_id,
           CAST(date_diff('microsecond',
                          greatest(a.a_start, b.b_start),
                          least(a.a_end, b.b_end)) AS BIGINT) AS overlap_us
    FROM a JOIN b ON a.user_id = b.user_id
                 AND a.a_start < b.b_end AND b.b_start < a.a_end
    ORDER BY a.user_id, a.click_id, b.purchase_id
    """,
)
def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: each user's click activity window ([ts,
    ts+30 min)) paired with every purchase window it overlaps, with the
    exact overlap duration — the attribution/exposure shape where BOTH
    sides are intervals (vs q_join_range's point-in-range and
    q_join_asof's nearest-point). Plan: equi-join on user_id with the
    overlap condition as a residual filter — pair expansion is bounded
    per user key, the join co-locates on the already-hashed key, and at
    100 TB skewed users fall to AQE skew splitting (test-asserted on a
    one-user-owns-half-the-intervals fixture; same posture as
    q_join_range_binned for the keyless case). Overlap arithmetic is
    exact integer microseconds."""
    ev = load_table(spark, sf_dir, "events")
    half_hour = F.expr("INTERVAL 30 MINUTES")
    a = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("a_start"),
        (F.col("ts") + half_hour).alias("a_end"),
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("b_start"),
        (F.col("ts") + half_hour).alias("b_end"),
    )
    return interval_overlap_pairs(a, b).orderBy(
        "user_id", "click_id", "purchase_id"
    )


@query(
    "q_date_spine",
    oracle="""
    WITH bounds AS (
        SELECT CAST(MIN(o_orderdate) AS DATE) AS d0,
               CAST(MAX(o_orderdate) AS DATE) AS d1
        FROM orders
    ),
    spine AS (
        SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS d
        FROM bounds
    ),
    daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT s.d,
           CAST(COALESCE(dl.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(dayofweek(s.d) IN (0, 6) AS BOOLEAN) AS is_weekend
    FROM spine s LEFT JOIN daily dl ON dl.d = s.d
    ORDER BY s.d
    """,
)
def q_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar date-spine generation + zero-fill: a dense daily calendar
    spanning the order history (generated with sequence/explode — no
    source table), left-joined to daily order counts so days with NO
    orders appear as explicit zeros, with a weekend flag — the dimension
    every time-grouped report needs to avoid silently missing days.
    The spine generates from a 1-row bounds aggregate (driverless,
    engine-side explode), stays broadcast-size (days, not rows), and the
    daily counts partial-aggregate map-side before the tiny join."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min(F.to_date("o_orderdate")).alias("d0"),
        F.max(F.to_date("o_orderdate")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    # Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dayofweek: 0=Sunday..6
    return (
        spine.join(daily, "d", "left")
        .select(
            "d",
            F.coalesce(F.col("n_orders"), F.lit(0)).cast("bigint").alias("n_orders"),
            F.dayofweek("d").isin(1, 7).alias("is_weekend"),
        )
        .orderBy("d")
    )


@query(
    "q_join_asof_nearest",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    ), purchases AS (
        SELECT user_id, ts AS p_ts, event_id AS p_id
        FROM events WHERE event_type = 'purchase'
    ), bk AS (
        SELECT c.user_id, c.ts, c.event_id,
               p.p_id AS prev_id, p.p_ts AS prev_ts
        FROM clicks c
        ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND c.ts >= p.p_ts
    ), fw AS (
        SELECT c.user_id, c.ts, c.event_id,
               p.p_id AS next_id, p.p_ts AS next_ts
        FROM clicks c
        ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND c.ts <= p.p_ts
    )
    SELECT b.user_id, b.ts, b.event_id,
           CAST(CASE
               WHEN b.prev_id IS NULL AND f.next_id IS NULL THEN NULL
               WHEN b.prev_id IS NULL THEN f.next_id
               WHEN f.next_id IS NULL THEN b.prev_id
               WHEN epoch_us(b.ts) - epoch_us(b.prev_ts)
                    <= epoch_us(f.next_ts) - epoch_us(f.ts)
                   THEN b.prev_id
               ELSE f.next_id END AS BIGINT) AS nearest_purchase_id,
           CASE
               WHEN b.prev_id IS NULL AND f.next_id IS NULL THEN NULL
               WHEN b.prev_id IS NULL THEN 'fwd'
               WHEN f.next_id IS NULL THEN 'back'
               WHEN epoch_us(b.ts) - epoch_us(b.prev_ts)
                    <= epoch_us(f.next_ts) - epoch_us(f.ts)
                   THEN 'back'
               ELSE 'fwd' END AS direction
    FROM bk b
    JOIN fw f ON f.user_id = b.user_id AND f.ts = b.ts
               AND f.event_id = b.event_id
    ORDER BY b.user_id, b.ts, b.event_id
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join — the third member of the as-of
    family (pandas merge_asof(direction='nearest')): each click matches
    whichever purchase is closer in time, the previous (backward) or the
    next (forward), ties to backward. Composed from the two existing
    shuffle-once as-of operators (operators/asof.py) joined back on the
    left key — distances compare in exact epoch microseconds, so the
    direction choice is integer arithmetic on both engines. Scale: two
    union+window as-of passes + one equi-join on the left row key —
    three key-partitioned shuffles total, no row multiplication."""
    from stockmarketdata_dwb_etl_spark.operators.asof import (
        asof_join_backward,
        asof_join_forward,
    )

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    p_b = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("ts").alias("prev_ts"),
        F.col("event_id").alias("prev_id"),
    )
    p_f = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("ts").alias("next_ts"),
        F.col("event_id").alias("next_id"),
    )
    bk = asof_join_backward(
        clicks, p_b, key_cols=["user_id"], ts_col="ts",
        right_payload=["prev_id", "prev_ts"],
    )
    fw = asof_join_forward(
        clicks, p_f, key_cols=["user_id"], ts_col="ts",
        right_payload=["next_id", "next_ts"],
    )
    j = bk.join(fw, ["user_id", "ts", "event_id"])
    back_age = F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
    fwd_age = F.expr("timestampdiff(MICROSECOND, ts, next_ts)")
    prefer_back = back_age <= fwd_age
    return j.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("prev_id").isNull() & F.col("next_id").isNull(),
            F.lit(None).cast("bigint"),
        )
        .when(F.col("prev_id").isNull(), F.col("next_id"))
        .when(F.col("next_id").isNull(), F.col("prev_id"))
        .when(prefer_back, F.col("prev_id"))
        .otherwise(F.col("next_id"))
        .cast("bigint")
        .alias("nearest_purchase_id"),
        F.when(
            F.col("prev_id").isNull() & F.col("next_id").isNull(),
            F.lit(None).cast("string"),
        )
        .when(F.col("prev_id").isNull(), F.lit("fwd"))
        .when(F.col("next_id").isNull(), F.lit("back"))
        .when(prefer_back, F.lit("back"))
        .otherwise(F.lit("fwd"))
        .alias("direction"),
    ).orderBy("user_id", "ts", "event_id")


@query(
    "q_time_to_convert",
    oracle="""
    WITH views AS (
        SELECT user_id, ts AS v_ts FROM events WHERE event_type = 'view'
    ), purchases AS (
        SELECT user_id, ts, event_id FROM events
        WHERE event_type = 'purchase'
    ), paired AS (
        SELECT (epoch_us(p.ts) - epoch_us(v.v_ts)) // 60000000 AS delay_min
        FROM purchases p
        ASOF JOIN views v
          ON p.user_id = v.user_id AND p.ts >= v.v_ts
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY delay_min)
                AS BIGINT) AS p25_min,
           CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY delay_min)
                AS BIGINT) AS p50_min,
           CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY delay_min)
                AS BIGINT) AS p75_min,
           CAST(MAX(delay_min) AS BIGINT) AS max_min
    FROM paired
    """,
)
def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: each purchase paired with the
    user's most recent PRIOR view via the backward as-of operator
    (INNER flavor — unconverted purchases drop, matching the oracle's
    ASOF JOIN), delay floored to integer minutes, summarized with
    DISCRETE percentiles — every output is an exact integer picked from
    the data, so no float touches any boundary. The funnel-latency
    report that sets SLA expectations for conversion attribution.
    Scale: one as-of pass (union + window, shuffle-once on user) + one
    global agg over integer delays."""
    from stockmarketdata_dwb_etl_spark.operators.asof import asof_join_backward

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("ts").alias("v_ts")
    )
    paired = asof_join_backward(
        purchases,
        views,
        key_cols=["user_id"],
        ts_col="ts",
        right_payload=["v_ts"],
    ).filter(F.col("v_ts").isNotNull())
    delays = paired.select(
        F.expr("timestampdiff(MICROSECOND, v_ts, ts) div 60000000")
        .cast("bigint")
        .alias("delay_min")
    )
    return delays.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY delay_min)")
        .cast("bigint")
        .alias("p25_min"),
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY delay_min)")
        .cast("bigint")
        .alias("p50_min"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY delay_min)")
        .cast("bigint")
        .alias("p75_min"),
        F.max("delay_min").cast("bigint").alias("max_min"),
    )


@query(
    "q_peak_concurrency",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts,
               SUM(new_sess) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM marked
    ),
    sessions AS (
        SELECT user_id, sess_id,
               MIN(ts) AS s_start,
               MAX(ts) + INTERVAL 30 MINUTE AS s_end
        FROM numbered GROUP BY user_id, sess_id
    ),
    bounds AS (
        SELECT CAST(s_start AS DATE) AS day, s_start AS bts, 1 AS delta
        FROM sessions
        UNION ALL
        SELECT CAST(s_start AS DATE), s_end, -1 FROM sessions
    ),
    swept AS (
        SELECT day,
               SUM(delta) OVER (PARTITION BY day
                                ORDER BY bts, delta
                                ROWS UNBOUNDED PRECEDING) AS conc
        FROM bounds
    )
    SELECT day,
           CAST(MAX(conc) AS BIGINT) AS peak_concurrent,
           CAST(COUNT(*) / 2 AS BIGINT) AS n_sessions
    FROM swept GROUP BY day ORDER BY day
    """,
)
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day via the sweep-line pattern: gap
    sessionization (30-min, same construction as q_session_window),
    each session emits a +1 boundary at start and a −1 at end, a
    running sum over the time-ordered boundaries traces the concurrency
    curve, and its max is the capacity-planning number. Boundary ties
    order (ts, delta) so an end at the same instant counts before the
    next start — the standard closed-open convention; sessions
    attribute to their start day. All integer arithmetic. Scale: the
    sweep window partitions by DAY (calendar-bounded slices of the
    boundary stream, never a global sort); sessionization shuffles on
    user_id once."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.expr("timestampdiff(MICROSECOND, lag(ts) OVER "
                       "(PARTITION BY user_id ORDER BY ts, event_id), ts)")
                > 1_800_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = marked.select(
        "user_id", "ts", F.sum("new_sess").over(wrun).alias("sess_id")
    )
    sessions = numbered.groupBy("user_id", "sess_id").agg(
        F.min("ts").alias("s_start"),
        F.expr("max(ts) + INTERVAL 30 MINUTE").alias("s_end"),
    )
    bounds = sessions.select(
        F.col("s_start").cast("date").alias("day"),
        F.col("s_start").alias("bts"),
        F.lit(1).alias("delta"),
    ).unionByName(
        sessions.select(
            F.col("s_start").cast("date").alias("day"),
            F.col("s_end").alias("bts"),
            F.lit(-1).alias("delta"),
        )
    )
    wsweep = (
        Window.partitionBy("day")
        .orderBy("bts", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = bounds.select("day", F.sum("delta").over(wsweep).alias("conc"))
    return (
        swept.groupBy("day")
        .agg(
            F.max("conc").cast("bigint").alias("peak_concurrent"),
            (F.count(F.lit(1)) / 2).cast("bigint").alias("n_sessions"),
        )
        .orderBy("day")
    )
