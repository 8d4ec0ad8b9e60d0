"""Pilot for the two-long-bucket _ssum (r12 verdict next-round item 4).

Phase 1 — equivalence: on adversarial random doubles in (-1, 1) the
DECIMAL(38,12) _ssum and the hi/lo BIGINT reassembly must be BIT-identical
per group (including sign mixes, denormal-ish magnitudes, and exact .5*10^-12
boundaries).

Phase 2 — interleaved steady-state A/B on the real gram-matrix shape
(d(d+1)/2 fan + group agg over the sf0.1 embeddings), alternating old/new
within ONE session so VM drift cannot fake a result.

Usage: python scripts/ssum_hilo_pilot.py [--bench]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stockmarketdata_dwb_etl_spark.queries.dataops11 import (
    _ssum,
    _ssum_fin,
    _ssum_hilo,
)
from stockmarketdata_dwb_etl_spark.session import get_spark


def main() -> None:
    spark = get_spark(app_name="ssum-hilo-pilot")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # ---- Phase 1: bit equivalence on adversarial terms -------------------
    n = 12
    base = spark.range(0, 2_000_00).select(
        (F.col("id") % 64).alias("g"),
        # mix magnitudes: uniform (-1,1), tiny, and exact half-boundary
        # multiples of 10^-12 (k*1e-12 + 0.5e-12 stresses the floor+0.5)
        F.when(F.col("id") % 3 == 0, F.rand(42) * 2 - 1)
        .when(F.col("id") % 3 == 1, (F.rand(43) - 0.5) * 1e-9)
        .otherwise(
            (F.floor(F.rand(44) * 1e6) * 1e3 + 500.0) / F.lit(1e12)
        )
        .alias("x"),
    )
    old = base.groupBy("g").agg(_ssum(F.col("x"), n).alias("s"))
    hi, lo = _ssum_hilo(F.col("x"), n)
    new = (
        base.groupBy("g")
        .agg(hi.alias("sh"), lo.alias("sl"))
        .select("g", _ssum_fin(F.col("sh"), F.col("sl"), n).alias("s"))
    )
    j = old.alias("o").join(new.alias("n"), "g")
    bad = j.filter(
        ~(
            (F.col("o.s") == F.col("n.s"))
            | (F.col("o.s").isNull() & F.col("n.s").isNull())
        )
    ).count()
    # compare raw bits too (== treats -0.0 == 0.0; the contract is bits)
    badbits = j.filter(
        F.expr("cast(o.s as string) <> cast(n.s as string)")
    ).count()
    print(f"EQUIVALENCE groups_mismatched={bad} bits_mismatched={badbits}")
    assert bad == 0 and badbits == 0, "hi/lo _ssum diverged from DECIMAL"

    if "--bench" not in sys.argv:
        return

    # ---- Phase 2: interleaved A/B on the gram shape ----------------------
    from stockmarketdata_dwb_etl_spark.functions.exact import portable_round
    from stockmarketdata_dwb_etl_spark.functions.vectors import spread_rows
    from stockmarketdata_dwb_etl_spark.catalog import load_table

    emb = spread_rows(load_table(spark, sf_dir, "embeddings"))
    v = F.transform("embedding", lambda x: x.cast("double"))
    triples = emb.select(
        F.explode(
            F.flatten(
                F.transform(
                    v,
                    lambda x, i: F.filter(
                        F.transform(
                            v,
                            lambda y, j: F.struct(
                                (i + 1).alias("i"),
                                (j + 1).alias("j"),
                                (x * y).alias("p"),
                            ),
                        ),
                        lambda s: s["j"] >= s["i"],
                    ),
                )
            )
        ).alias("t")
    ).select("t.i", "t.j", "t.p")

    q_old = triples.groupBy("i", "j").agg(
        portable_round(_ssum(F.col("p"), 12), 6).cast("double").alias("gram")
    )
    hi2, lo2 = _ssum_hilo(F.col("p"), 12)
    q_new = (
        triples.groupBy("i", "j")
        .agg(hi2.alias("sh"), lo2.alias("sl"))
        .select(
            "i",
            "j",
            portable_round(_ssum_fin(F.col("sh"), F.col("sl"), 12), 6)
            .cast("double")
            .alias("gram"),
        )
    )

    def run(df) -> float:
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warm both plans, then alternate
    run(q_old), run(q_new)
    olds, news = [], []
    for _ in range(4):
        olds.append(run(q_old))
        news.append(run(q_new))
    print(f"OLD steady {min(olds):.3f}s runs={[round(t,3) for t in olds]}")
    print(f"NEW steady {min(news):.3f}s runs={[round(t,3) for t in news]}")
    print(f"SPEEDUP x{min(olds)/min(news):.2f}")


if __name__ == "__main__":
    main()
