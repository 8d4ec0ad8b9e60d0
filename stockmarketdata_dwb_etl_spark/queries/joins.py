"""Join surface: equi (hash/broadcast), outer, semi/anti, theta/band,
cross and as-of joins.

Scale posture: dimension tables (region/nation/part-slices) are broadcast
explicitly; the band join broadcasts its deliberately-small probe side so
the planner emits BroadcastNestedLoopJoin instead of a cartesian shuffle;
the as-of join is the shuffle-once union+window composition from
operators/asof.py rather than a range-join explosion. Everything else is a
plain shuffled hash/sort-merge join that AQE may re-plan at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockmarketdata_dwb_etl_spark.functions.exact import portable_round
from stockmarketdata_dwb_etl_spark.catalog import load_table
from stockmarketdata_dwb_etl_spark.functions.exact import exact_sum, sql_exact_sum
from stockmarketdata_dwb_etl_spark.operators.asof import asof_join_backward
from stockmarketdata_dwb_etl_spark.registry import query


@query(
    "q_join_inner",
    oracle="""
    SELECT c_custkey, c_name, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema equi-join; both dims broadcast (they are tiny at every
    scale factor — nation=25, region=5 rows)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@query(
    "q_join_broadcast",
    oracle="""
    SELECT l_orderkey, l_linenumber, p_brand, p_retailprice
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size < 20
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⨝ broadcast(dim): part is ~1/30 the size of lineitem — the
    explicit broadcast avoids shuffling the big fact table entirely."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 20)
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_orderkey", "l_linenumber", "p_brand", "p_retailprice"
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer
    LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') p
      ON c_custkey = p.o_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT JOIN preserving null-probe rows (customers without a pending
    order keep NULL order columns)."""
    cust = load_table(spark, sf_dir, "customer")
    pending = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return cust.join(pending, cust.c_custkey == pending.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "q_join_full",
    oracle="""
    SELECT coalesce(f.o_custkey, p.o_custkey) AS custkey, n_f, n_p
    FROM (SELECT o_custkey, COUNT(*) AS n_f FROM orders
          WHERE o_orderstatus = 'F' GROUP BY o_custkey) f
    FULL OUTER JOIN
         (SELECT o_custkey, COUNT(*) AS n_p FROM orders
          WHERE o_orderstatus = 'P' GROUP BY o_custkey) p
      ON f.o_custkey = p.o_custkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER on overlapping + disjoint key sets."""
    orders = load_table(spark, sf_dir, "orders")
    f = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_f"))
    )
    p = (
        orders.filter(F.col("o_orderstatus") == "P")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_p"))
    )
    return f.join(p, "o_custkey", "full").select(
        F.col("o_custkey").alias("custkey"), "n_f", "n_p"
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI: customers with at least one big order — no row
    multiplication, probe side streamed."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI: customers with no pending order."""
    cust = load_table(spark, sf_dir, "customer")
    pending = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return cust.join(pending, cust.c_custkey == pending.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_range",
    oracle=f"""
    SELECT p1.p_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_neighbors,
           {sql_exact_sum('p2.p_retailprice', 'sum_neighbor_price')}
    FROM part p1
    JOIN part p2
      ON p2.p_size BETWEEN p1.p_size - 1 AND p1.p_size + 1
     AND p2.p_partkey <> p1.p_partkey
    WHERE p1.p_partkey % 100 = 0
    GROUP BY p1.p_partkey
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (theta) join: parts within ±1 size of each probe part.

    The probe side is deliberately small (1% of part) and broadcast, so the
    physical plan is BroadcastNestedLoopJoin over a streamed part scan — no
    cartesian shuffle. At 100 TB the same shape holds: tiny probe set ×
    large table.
    """
    part = load_table(spark, sf_dir, "part")
    p1 = part.filter(F.col("p_partkey") % 100 == 0).select(
        F.col("p_partkey").alias("p1_partkey"), F.col("p_size").alias("p1_size")
    )
    p2 = part.select("p_partkey", "p_size", "p_retailprice")
    cond = (
        (F.col("p_size") >= F.col("p1_size") - 1)
        & (F.col("p_size") <= F.col("p1_size") + 1)
        & (F.col("p_partkey") != F.col("p1_partkey"))
    )
    joined = F.broadcast(p1).join(p2, cond, "inner")
    return (
        joined.groupBy("p1_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_neighbors"),
            exact_sum(F.col("p_retailprice"), "sum_neighbor_price"),
        )
        .select(F.col("p1_partkey").alias("p_partkey"), "n_neighbors", "sum_neighbor_price")
    )


@query(
    "q_join_asof",
    oracle="""
    WITH purchases AS (
        SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
    ), clicks AS (
        SELECT user_id, ts AS click_ts, event_id AS click_id FROM events
        WHERE event_type = 'click'
    )
    SELECT p.user_id, p.ts, p.event_id, CAST((CAST(floor(CAST((p.value) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS value,
           c.click_id, c.click_ts
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent click at
    or before it (operators/asof.py — union + window, shuffle-once; cited
    parity target: DuckDB ASOF JOIN)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", portable_round("value", 4).alias("value")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    return asof_join_backward(
        purchases,
        clicks,
        key_cols=["user_id"],
        ts_col="ts",
        right_payload=["click_id", "click_ts"],
    )


@query(
    "q_join_salted_skew",
    oracle="""
    WITH fact AS (
        SELECT CASE WHEN l_orderkey % 4 <> 0 THEN 1 ELSE l_orderkey END AS hot_key,
               l_extendedprice
        FROM lineitem
    ), dim AS (
        SELECT o_orderkey AS hot_key, o_orderpriority FROM orders
    )
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST((CAST(floor(CAST((SUM(CAST(l_extendedprice AS DECIMAL(38,6)))) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE)
             AS sum_price
    FROM fact JOIN dim USING (hot_key)
    GROUP BY o_orderpriority
    """,
)
def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join under adversarial skew (operators/skew.py): ~75% of the
    fact rows share one hot key, which would pin an unsalted shuffle join
    to a single reducer at scale. The fact side is salted 16 ways from its
    own line identity, the dim side replicated ×16; the shuffle_hash hint
    models the dim-too-big-to-broadcast case the technique exists for.
    Results are identical to the plain join (the oracle runs the unsalted
    form)."""
    from stockmarketdata_dwb_etl_spark.functions.exact import exact_sum
    from stockmarketdata_dwb_etl_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    fact = li.select(
        F.when(F.col("l_orderkey") % 4 != 0, F.lit(1))
        .otherwise(F.col("l_orderkey"))
        .alias("hot_key"),
        "l_extendedprice",
        "l_orderkey",
        "l_linenumber",
    )
    dim = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("hot_key"), "o_orderpriority"
    )
    joined = salted_join(
        fact,
        dim.hint("shuffle_hash"),
        "hot_key",
        salt_source=F.xxhash64("l_orderkey", "l_linenumber"),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum(F.col("l_extendedprice"), "sum_price"),
    )


@query(
    "q_agg_salted_skew",
    oracle="""
    WITH keyed AS (
        SELECT CASE WHEN user_id % 4 <> 0 THEN 'hot'
                    ELSE 'user_' || CAST(user_id AS VARCHAR) END AS skew_key,
               user_id, value
        FROM events
    )
    SELECT skew_key,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST((CAST(floor(CAST((SUM(value)) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS total,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM keyed
    GROUP BY skew_key
    """,
)
def q_agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation under adversarial group-key skew: ~75% of rows share one
    hot key. Two scale techniques, both producing exactly the plain
    GROUP BY result (the oracle runs the unsalted form):

    - **Salted two-stage agg** for the algebraic aggregates (count/sum):
      stage 1 groups by (key, salt16) so the hot key's stream fans out
      across 16 reducers; stage 2 re-associates the 16 partial rows per
      key. (Spark's map-side partial aggregation already bounds the
      per-reducer row count to one-per-map-task for algebraic aggs; the
      salt is the explicit form of that guarantee for engines/paths
      without partial agg, and for collect-type aggregates.)
    - **Two-phase exact distinct** for COUNT(DISTINCT user_id): dedup on
      (key, user_id) — hash-spread over BOTH columns, so the hot key's
      distinct stream never lands on one reducer — then count per key.
      This is the rewrite that keeps exact distinct viable at 100 TB;
      the single-phase form pins the hot key to one task.

    The two small per-key results broadcast-join back together (no
    shuffle on the final stitch)."""
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        F.when(F.col("user_id") % 4 != 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("user_"), F.col("user_id").cast("string")))
        .alias("skew_key"),
        "user_id",
        "value",
        "event_id",
    )
    salted = keyed.withColumn("__salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
    partial = salted.groupBy("skew_key", "__salt").agg(
        F.count(F.lit(1)).alias("p_cnt"), F.sum("value").alias("p_sum")
    )
    algebraic = partial.groupBy("skew_key").agg(
        F.sum("p_cnt").alias("cnt"), portable_round(F.sum("p_sum"), 4).alias("total")
    )
    distinct_pairs = keyed.select("skew_key", "user_id").distinct()
    exact_distinct = distinct_pairs.groupBy("skew_key").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    return algebraic.join(F.broadcast(exact_distinct), "skew_key").select(
        "skew_key", "cnt", "total", "n_users"
    )


@query(
    "q_join_range_binned",
    oracle=f"""
    SELECT p1.p_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_neighbors,
           {sql_exact_sum('p2.p_retailprice', 'sum_neighbor_price')}
    FROM part p1
    JOIN part p2
      ON p2.p_size BETWEEN p1.p_size - 1 AND p1.p_size + 1
     AND p2.p_partkey <> p1.p_partkey
    GROUP BY p1.p_partkey
    """,
)
def q_join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join where BOTH sides are large — the case q_join_range's
    broadcast-nested-loop shape cannot serve. The general 100 TB rewrite
    replicates each probe row into the band-width-sized bins it can
    match (offsets {-1, 0, +1}) and hash-joins on the bin key — but
    when the band aggregate is per-bin DECOMPOSABLE (count/exact-sum
    here), the pair table never needs to exist at all: aggregate each
    exact size once, explode the bin-domain-sized size table into the
    neighborhoods it serves, and give every probe its band total with
    one broadcast join, subtracting its own contribution for the
    self-pair exclusion (exact DECIMAL, so the subtraction is lossless
    and the result is bit-identical to the oracle's naive theta join —
    a probe whose band holds only itself produces no group in the
    inner join, hence the n ≥ 1 filter).

    Scale: the former pair-producing form shuffled O(band × rows) rows
    (24M at sf0.1, 13.1 s steady); this one shuffles the per-size
    partial aggregate (≤ |size domain| rows per map task) and
    broadcasts the 50-row neighborhood table — guide §2.3
    "aggregate before you shuffle" taken to its limit. The replicate-
    into-bins pair join remains THE shape for non-decomposable band
    consumers (nearest-row semantics, per-pair residuals)."""
    from stockmarketdata_dwb_etl_spark.functions.exact import sql_exact_sum  # noqa: F401

    part = load_table(spark, sf_dir, "part")
    dec = F.col("p_retailprice").cast("decimal(38,6)")
    sizes = part.groupBy("p_size").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(dec).alias("s"),
    )
    nb = (
        sizes.withColumn(
            "bin",
            F.explode(
                F.array(
                    F.col("p_size") - 1, F.col("p_size"), F.col("p_size") + 1
                )
            ),
        )
        .groupBy("bin")
        .agg(F.sum("cnt").alias("n_all"), F.sum("s").alias("s_all"))
    )
    return (
        part.join(F.broadcast(nb), F.col("p_size") == F.col("bin"))
        .filter(F.col("n_all") >= 2)
        .select(
            "p_partkey",
            (F.col("n_all") - 1).alias("n_neighbors"),
            # coalesce: a NULL own-price row must subtract 0 (the pair
            # join sums neighbors' non-null prices regardless of the
            # probe's own value); p_retailprice is NOT NULL under TPC-H,
            # so this is identity on the declared fixture
            F.round(
                F.col("s_all") - F.coalesce(dec, F.lit(0).cast("decimal(38,6)")), 4
            )
            .cast("double")
            .alias("sum_neighbor_price"),
        )
    )


@query(
    "q_bloom_join",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST((CAST(floor(CAST((SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(38,6)))) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderpriority
    """,
)
def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered selective join (operators/bloom.py): revenue of
    lineitems belonging to URGENT orders. The urgent-order dim (~20% of
    orders) is — at 100 TB — too large to broadcast, so the plain join
    shuffles every lineitem; the bloom prefilter drops ~80% of the fact
    rows MAP-SIDE for the cost of a 16 KiB sketch broadcast, and the real
    equi-join erases the bloom's false positives, so the result is exactly
    the oracle's join. This is the manual form of Spark's runtime
    row-level filtering (not exposed via the public function registry),
    kept as an explicit operator so the rewrite is available to ANY
    fact-preserving join, not only where the optimizer infers it."""
    from stockmarketdata_dwb_etl_spark.operators.bloom import bloom_prefilter_join

    li = load_table(spark, sf_dir, "lineitem")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey", "o_orderpriority")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        bloom_prefilter_join(li, urgent, "l_orderkey", "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            exact_sum(revenue, "revenue"),
        )
    )


@query(
    "q_join_asof_tolerance",
    oracle="""
    WITH purchases AS (
        SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
    ), clicks AS (
        SELECT user_id, ts AS click_ts, event_id AS click_id FROM events
        WHERE event_type = 'click'
    ), matched AS (
        SELECT p.user_id, p.ts, p.event_id,
               CAST((CAST(floor(CAST((p.value) AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0) AS DOUBLE) AS value,
               c.click_id, c.click_ts
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.click_ts
    )
    SELECT user_id, ts, event_id, value,
           CASE WHEN ts - click_ts <= INTERVAL 30 MINUTE THEN click_id END
             AS click_id,
           CASE WHEN ts - click_ts <= INTERVAL 30 MINUTE THEN click_ts END
             AS click_ts
    FROM matched
    """,
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a 30-minute staleness bound — the feature-store /
    pandas merge_asof(tolerance=...) shape: each purchase takes the user's
    most recent click ONLY if it happened within the last 30 minutes,
    otherwise NULL (a stale feature must not leak into the training row).
    Same single-shuffle union+window plan as q_join_asof — the tolerance
    is a post-fill null-out using the matched right row's own ts carried
    inside the payload struct (operators/asof.py), not a second join."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", portable_round("value", 4).alias("value")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    return asof_join_backward(
        purchases,
        clicks,
        key_cols=["user_id"],
        ts_col="ts",
        right_payload=["click_id", "click_ts"],
        tolerance_seconds=1800,
    )


@query(
    "q_join_null_safe",
    oracle="""
    WITH a AS (
        SELECT o_orderkey, NULLIF(o_orderkey % 50, 0) AS k FROM orders
        WHERE o_orderkey % 2 = 0
    ), b AS (
        SELECT NULLIF(o_orderkey % 50, 0) AS k,
               o_orderpriority FROM orders WHERE o_orderkey % 2 = 1
    )
    SELECT a.k,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT b.o_orderpriority) AS BIGINT) AS n_priorities
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    GROUP BY a.k
    """,
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (Spark `<=>` ≡ SQL IS NOT DISTINCT FROM):
    NULL keys MATCH EACH OTHER instead of vanishing — the semantics
    entity-resolution and late-arriving-dimension joins need when NULL is
    a real key value ('unknown') rather than an absence. Catalyst plans
    `<=>` as an ordinary hash-join key (nulls hash to one partition), so
    the plan is the same shuffled equi-join as q_join_inner; a heavy NULL
    key is exactly the hot-key case operators/skew.py::salted_join
    handles."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", F.nullif(F.col("o_orderkey") % 50, F.lit(0)).alias("k")
    )
    b = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        F.nullif(F.col("o_orderkey") % 50, F.lit(0)).alias("bk"),
        "o_orderpriority",
    )
    return (
        a.join(b, a["k"].eqNullSafe(b["bk"]))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
        )
    )
