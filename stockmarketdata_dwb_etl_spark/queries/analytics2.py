"""Analytics battery round 3: sequence mining (Markov transitions),
customer scoring (RFM), distribution comparison (two-sample KS),
rolling correlation, and the point-in-time (as-of effective-date) SCD2
dimension lookup.

These are the analyst shapes the reference delegates to BigQuery after
load (/root/reference/dump_bigq.py:135-149); the engine runs them
natively. Determinism policy (SURVEY.md §2B): integer counts and
integer-scaled comparisons wherever possible; any cross-row float sum
goes through the exact-decimal cast; divisions happen once, on already
deterministic operands, and results round before ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stockmarketdata_dwb_etl_spark.catalog import load_table
from stockmarketdata_dwb_etl_spark.functions.exact import exact_sum, sql_exact_sum
from stockmarketdata_dwb_etl_spark.registry import query

_DEC = "decimal(38,6)"


@query(
    "q_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    trans AS (
        SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    )
    SELECT prev_type, event_type, n,
           CAST(ROUND(CAST(n AS DOUBLE)
                      / SUM(n) OVER (PARTITION BY prev_type), 6) AS DOUBLE)
             AS prob
    FROM trans
    ORDER BY prev_type, event_type
    """,
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    P(next event type | current) — the sequence-mining primitive behind
    next-action prediction and funnel-anomaly detection. One lag window
    per user (ordered by ts with event_id tie-break, so concurrent events
    sequence identically on every engine), then an integer-count hash agg
    on the 5×5 type grid; the probability is a single division of exact
    integers. Scales: the user_id window shuffle is the only wide op, the
    transition grid is tiny and the normalizing row-sum runs over it."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    row_total = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "event_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(row_total), 6)
        .cast("double")
        .alias("prob"),
    ).orderBy("prev_type", "event_type")


@query(
    "q_rfm_segmentation",
    oracle=f"""
    WITH cust AS (
        SELECT o_custkey AS c_custkey,
               CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                              (SELECT CAST(MAX(o_orderdate) AS DATE)
                               FROM orders)) AS INTEGER) AS recency_days,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               {sql_exact_sum("o_totalprice", "monetary")}
        FROM orders GROUP BY 1
    )
    SELECT c_custkey, recency_days, frequency, monetary,
           CAST(ntile(5) OVER (ORDER BY recency_days DESC, c_custkey)
                AS INTEGER) AS r_score,
           CAST(ntile(5) OVER (ORDER BY frequency ASC, c_custkey)
                AS INTEGER) AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary ASC, c_custkey)
                AS INTEGER) AS m_score
    FROM cust
    ORDER BY c_custkey
    """,
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer scoring: recency (days since last order, vs the corpus
    max date), frequency (order count), monetary (exact-decimal revenue),
    each quintiled 1-5 with 5 = best. The ntile orderings carry a custkey
    tie-break so equal metrics tile identically on every engine.

    Scale posture: a naive ``ntile(5).over(Window.orderBy(...))`` funnels
    the whole customer grain through ONE partition (WindowExec warns);
    instead each score comes from operators/rank.py::global_row_number
    (range shuffle + per-partition rank + P-row offset stitch) +
    ntile_expr -- the same distributed total-order machinery as
    q_window_ntile, applied once per ordering. The corpus max date
    derives from the persisted per-customer aggregate (max of last dates
    == global max), so orders is scanned exactly once."""
    from stockmarketdata_dwb_etl_spark.operators.rank import (
        global_row_number,
        ntile_expr,
    )

    orders = load_table(spark, sf_dir, "orders")
    base = (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max(F.to_date("o_orderdate")).alias("__last_d"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            exact_sum(F.col("o_totalprice"), "monetary"),
        )
        .persist()
    )
    max_date = base.agg(F.max("__last_d").alias("__max_d"))
    cust = base.join(F.broadcast(max_date)).select(
        "c_custkey",
        F.datediff(F.col("__max_d"), F.col("__last_d"))
        .cast("int")
        .alias("recency_days"),
        "frequency",
        "monetary",
    )
    # ntile ORDER BY recency DESC == ntile over ascending negated recency
    cust = cust.withColumn("__neg_rec", -F.col("recency_days"))
    cust = global_row_number(
        cust, ["__neg_rec", "c_custkey"], out="__r_idx", n_total="__n"
    )
    cust = global_row_number(
        cust, ["frequency", "c_custkey"], out="__f_idx", n_total=None
    )
    cust = global_row_number(
        cust, ["monetary", "c_custkey"], out="__m_idx", n_total=None
    )
    return cust.select(
        "c_custkey",
        "recency_days",
        "frequency",
        "monetary",
        ntile_expr(F.col("__r_idx"), F.col("__n"), 5).cast("int").alias("r_score"),
        ntile_expr(F.col("__f_idx"), F.col("__n"), 5).cast("int").alias("f_score"),
        ntile_expr(F.col("__m_idx"), F.col("__n"), 5).cast("int").alias("m_score"),
    ).orderBy("c_custkey")


@query(
    "q_ks_test",
    oracle="""
    WITH pts AS (
        SELECT event_type, value,
               CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c2
        FROM events GROUP BY event_type, value
    ),
    cdf AS (
        SELECT event_type,
               SUM(c1) OVER (PARTITION BY event_type ORDER BY value
                             ROWS UNBOUNDED PRECEDING) AS cum1,
               SUM(c2) OVER (PARTITION BY event_type ORDER BY value
                             ROWS UNBOUNDED PRECEDING) AS cum2,
               SUM(c1) OVER (PARTITION BY event_type) AS n1,
               SUM(c2) OVER (PARTITION BY event_type) AS n2
        FROM pts
    )
    SELECT event_type,
           CAST(MAX(n1) AS BIGINT) AS n1,
           CAST(MAX(n2) AS BIGINT) AS n2,
           CAST(ROUND(CAST(MAX(abs(cum1 * n2 - cum2 * n1)) AS DOUBLE)
                      / (MAX(n1) * MAX(n2)), 9) AS DOUBLE) AS ks_d
    FROM cdf
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic per event_type between the
    even/odd event_id cohorts — the drift detector that, unlike PSI
    (q_psi_drift), needs no binning choice. The CDF difference is kept as
    the INTEGER |cum1*n2 − cum2*n1| until the final single division, so
    the max is over exact values and no float boundary can reorder it.
    Values are grouped (distinct) first, making tie handling identical on
    both engines. Scales: one hash agg on (type, value), one ordered
    window per type — same shape as any per-key CDF."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.groupBy("event_type", "value").agg(
        F.sum(F.when(F.col("event_id") % 2 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("c1"),
        F.sum(F.when(F.col("event_id") % 2 == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("c2"),
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("event_type")
    cdf = pts.select(
        "event_type",
        F.sum("c1").over(wc).alias("cum1"),
        F.sum("c2").over(wc).alias("cum2"),
        F.sum("c1").over(wt).alias("n1"),
        F.sum("c2").over(wt).alias("n2"),
    )
    return (
        cdf.groupBy("event_type")
        .agg(
            F.max("n1").cast("bigint").alias("n1"),
            F.max("n2").cast("bigint").alias("n2"),
            F.max(F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")))
            .alias("__d_num"),
        )
        .select(
            "event_type",
            "n1",
            "n2",
            F.round(
                F.col("__d_num").cast("double") / (F.col("n1") * F.col("n2")), 9
            )
            .cast("double")
            .alias("ks_d"),
        )
        .orderBy("event_type")
    )


@query(
    "q_rolling_corr",
    oracle="""
    WITH pairs AS (
        SELECT event_type, event_id, value AS x,
               lag(value) OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS y
        FROM events
    ),
    seq AS (
        SELECT event_type, event_id, x, y,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY event_id) AS rn
        FROM pairs WHERE y IS NOT NULL
    ),
    sums AS (
        SELECT event_type, event_id, rn,
               CAST(SUM(CAST(x AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sy,
               CAST(SUM(CAST(x * y AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x * x AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y * y AS DECIMAL(38,6))) OVER w AS DOUBLE) AS syy
        FROM seq
        WINDOW w AS (PARTITION BY event_type ORDER BY rn
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, event_id,
           CASE WHEN (20 * sxx - sx * sx) * (20 * syy - sy * sy) > 0
                THEN CAST(ROUND((20 * sxy - sx * sy)
                     / sqrt((20 * sxx - sx * sx) * (20 * syy - sy * sy)), 6)
                     AS DOUBLE)
           END AS corr20
    FROM sums WHERE rn >= 20
    ORDER BY event_type, event_id
    """,
)
def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 20-observation lag-1 autocorrelation per event_type — the
    feature-engineering shape for momentum/mean-reversion signals. Frame
    sums go through the exact-decimal cast (sliding-window float
    accumulation differs per engine: Spark recomputes, DuckDB
    subtracts-on-evict), then the Pearson combination runs in double with
    the identical operation order on both sides before a 6dp round.
    Scales: two ordered windows per type partition, no self-join — the
    frame is O(1) state per row."""
    ev = load_table(spark, sf_dir, "events")
    lagw = Window.partitionBy("event_type").orderBy("ts", "event_id")
    pairs = ev.select(
        "event_type",
        "event_id",
        F.col("value").alias("x"),
        F.lag("value").over(lagw).alias("y"),
    ).filter(F.col("y").isNotNull())
    seq = pairs.withColumn(
        "rn", F.row_number().over(Window.partitionBy("event_type").orderBy("event_id"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("rn")
        .rowsBetween(-19, 0)
    )

    def dsum(col: F.Column, alias: str) -> F.Column:
        return F.sum(col.cast(_DEC)).over(w).cast("double").alias(alias)

    sums = seq.select(
        "event_type",
        "event_id",
        "rn",
        dsum(F.col("x"), "sx"),
        dsum(F.col("y"), "sy"),
        dsum(F.col("x") * F.col("y"), "sxy"),
        dsum(F.col("x") * F.col("x"), "sxx"),
        dsum(F.col("y") * F.col("y"), "syy"),
    ).filter(F.col("rn") >= 20)
    n = F.lit(20)
    var_term = (n * F.col("sxx") - F.col("sx") * F.col("sx")) * (
        n * F.col("syy") - F.col("sy") * F.col("sy")
    )
    corr = F.when(
        var_term > 0,
        F.round(
            (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(var_term), 6
        ).cast("double"),
    )
    return sums.select("event_type", "event_id", corr.alias("corr20")).orderBy(
        "event_type", "event_id"
    )


_SCD2_DIM_SQL = """
        SELECT c_custkey, c_mktsegment,
               CASE WHEN c_custkey % 13 = 0 THEN DATE '1998-01-01'
                    ELSE DATE '1990-01-01' END AS effective_from,
               DATE '9999-12-31' AS effective_to
        FROM customer
        UNION ALL
        SELECT c_custkey, 'LEGACY' AS c_mktsegment,
               DATE '1990-01-01' AS effective_from,
               DATE '1998-01-01' AS effective_to
        FROM customer WHERE c_custkey % 13 = 0
"""


@query(
    "q_scd2_lookup",
    oracle=f"""
    WITH dim AS ({_SCD2_DIM_SQL})
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_exact_sum("o_totalprice", "revenue")}
    FROM orders
    JOIN dim ON o_custkey = c_custkey
            AND CAST(o_orderdate AS DATE) >= effective_from
            AND CAST(o_orderdate AS DATE) < effective_to
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup: each order joins the SCD2 customer
    version that was effective ON ITS ORDER DATE (as-of effective-range
    predicate), then revenue rolls up by the segment-at-order-time — the
    late-arriving-fact / historical-reporting join every warehouse needs
    and a truncate-reload dimension (the reference's approach,
    /root/reference/dump_bigq.py:135-145) cannot answer. The versioned dim
    is built deterministically (every 13th customer was LEGACY before
    1998-01-01). Plan: dim broadcasts (equi-key + residual range filter);
    the fact never shuffles before the final small agg. At 100 TB the
    same plan holds — SCD2 dims stay broadcast-size; were they not, the
    equi-key shuffle join with the range residual is the fallback."""
    cust = load_table(spark, sf_dir, "customer")
    legacy_key = F.col("c_custkey") % 13 == 0
    current = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.when(legacy_key, F.to_date(F.lit("1998-01-01")))
        .otherwise(F.to_date(F.lit("1990-01-01")))
        .alias("effective_from"),
        F.to_date(F.lit("9999-12-31")).alias("effective_to"),
    )
    legacy = cust.filter(legacy_key).select(
        "c_custkey",
        F.lit("LEGACY").alias("c_mktsegment"),
        F.to_date(F.lit("1990-01-01")).alias("effective_from"),
        F.to_date(F.lit("1998-01-01")).alias("effective_to"),
    )
    dim = current.unionByName(legacy)
    orders = load_table(spark, sf_dir, "orders")
    od = F.to_date("o_orderdate")
    joined = orders.join(
        F.broadcast(dim),
        (F.col("o_custkey") == F.col("c_custkey"))
        & (od >= F.col("effective_from"))
        & (od < F.col("effective_to")),
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            exact_sum(F.col("o_totalprice"), "revenue"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q_weighted_median",
    oracle="""
    WITH vals AS (
        SELECT l_returnflag AS flag,
               l_extendedprice / l_quantity AS unit_price,
               SUM(CAST(l_quantity AS DECIMAL(38,6))) AS w
        FROM lineitem
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT flag, unit_price, w,
               SUM(w) OVER (PARTITION BY flag ORDER BY unit_price
                            ROWS UNBOUNDED PRECEDING) AS cumw,
               SUM(w) OVER (PARTITION BY flag) AS totw
        FROM vals
    )
    SELECT flag, MIN(unit_price) AS w_median
    FROM cum WHERE 2 * cumw >= totw
    GROUP BY flag
    ORDER BY flag
    """,
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median per return flag: the smallest unit price whose
    cumulative quantity-weight reaches half the group total — the robust
    location estimate where heavy rows should count proportionally
    (volume-weighted mid price). Weights aggregate per DISTINCT value
    first (so the cumulative sum is over value groups, not rows, and tie
    handling is definitionally identical), stay exact DECIMAL through the
    cumulative window, and the half-total test is the integer-scaled
    `2·cumw >= totw` — no float boundary. Scales: hash agg on
    (flag, value) + one ordered window per flag."""
    li = load_table(spark, sf_dir, "lineitem")
    vals = (
        li.select(
            F.col("l_returnflag").alias("flag"),
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
            F.col("l_quantity"),
        )
        .groupBy("flag", "unit_price")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("w"))
    )
    wc = (
        Window.partitionBy("flag")
        .orderBy("unit_price")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("flag")
    cum = vals.select(
        "flag",
        "unit_price",
        F.sum("w").over(wc).alias("cumw"),
        F.sum("w").over(wt).alias("totw"),
    )
    return (
        cum.filter(F.col("cumw") * 2 >= F.col("totw"))
        .groupBy("flag")
        .agg(F.min("unit_price").alias("w_median"))
        .orderBy("flag")
    )


@query(
    "q_null_impute",
    oracle="""
    WITH masked AS (
        SELECT event_id, event_type,
               CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
        FROM events
    ),
    means AS (
        SELECT event_type,
               CAST(ROUND(CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE)
                          / COUNT(v), 6) AS DOUBLE) AS type_mean
        FROM masked WHERE v IS NOT NULL
        GROUP BY event_type
    )
    SELECT m.event_id, m.event_type,
           CAST(COALESCE(m.v, e.type_mean) AS DOUBLE) AS value_filled,
           CAST(m.v IS NULL AS BOOLEAN) AS was_imputed
    FROM masked m JOIN means e ON e.event_type = m.event_type
    ORDER BY m.event_id
    """,
)
def q_null_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mean imputation — the data-prep primitive for ML feature
    tables: rows deterministically masked (event_id % 7) get their
    event_type's mean of the PRESENT values, exact-decimal-summed and
    6dp-rounded before the fill so both engines substitute the identical
    constant. The per-type mean table broadcasts; the fact is scanned
    once for the means and once for the fill — at 100 TB the masked scan
    is column-pruned and the means agg partial-aggregates map-side."""
    ev = load_table(spark, sf_dir, "events")
    masked = ev.select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("value")
        ).alias("v"),
    )
    means = (
        masked.filter(F.col("v").isNotNull())
        .groupBy("event_type")
        .agg(
            F.round(
                F.sum(F.col("v").cast(_DEC)).cast("double") / F.count("v"), 6
            )
            .cast("double")
            .alias("type_mean")
        )
    )
    return (
        masked.join(F.broadcast(means), "event_type")
        .select(
            "event_id",
            "event_type",
            F.coalesce(F.col("v"), F.col("type_mean"))
            .cast("double")
            .alias("value_filled"),
            F.col("v").isNull().alias("was_imputed"),
        )
        .orderBy("event_id")
    )
