"""Isolated ×10 probe of the exact-Jaccard VERIFY stage (r12 verdict #6).

The r12 union-free verify (|A∪B| = n_a + n_b − |A∩B|, sizes carried on the
candidate pair) measured equal-within-noise at sf0.1 — the claimed win is
at scale, where the per-pair O(|A|+|B|) array_union hash-set build
dominates the verify join. This probe MEASURES that claim: on the x1 and
x10 scale-probe corpora it materializes the shingle table and the sized
candidate pairs ONCE (persisted — both variants read identical warm
inputs), then times ONLY the verify join, interleaved old/new within one
session.

Usage: python scripts/verify_stage_probe.py   (writes plans/r13/verify_stage_probe.json
and merges verify_stage entries into SCALEPROBE.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stockmarketdata_dwb_etl_spark.functions.exact import portable_round
from stockmarketdata_dwb_etl_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_sets,
)
from stockmarketdata_dwb_etl_spark.scratch import SCRATCH, fixture_tag
from stockmarketdata_dwb_etl_spark.session import get_spark

BASE_SF = "/root/testdata/sf0.1"
THRESHOLD = 0.7


def main() -> None:
    spark = get_spark(app_name="verify-stage-probe")
    root = os.path.join(SCRATCH, "scaleprobe", fixture_tag(BASE_SF))
    results: dict[str, dict] = {}

    for scale in (1, 10):
        sf_dir = os.path.join(root, f"x{scale}")
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        aug = docs.select("doc_id", "text")

        shingled = shingle_sets(aug).persist()
        sigs = minhash_signatures(aug, shingled=shingled)
        cands = lsh_candidate_pairs(sigs, size_ratio=THRESHOLD).persist()
        n_shingled = shingled.count()
        n_cands = cands.count()

        sa = shingled.select(
            F.col("id").alias("id_a"), F.col("shingles").alias("sh_a")
        )
        sb = shingled.select(
            F.col("id").alias("id_b"), F.col("shingles").alias("sh_b")
        )

        # OLD verify: per-pair array_union
        jac_old = portable_round(
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")),
            4,
        )
        # NEW verify: sizes ride the candidate; union recovered arithmetically
        inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        jac_new = portable_round(
            inter / (F.col("n_a") + F.col("n_b") - inter), 4
        )

        def verify(jac):
            return (
                cands.join(sa, "id_a")
                .join(sb, "id_b")
                .select("id_a", "id_b", jac.alias("jaccard"))
                .filter(F.col("jaccard") >= THRESHOLD)
            )

        def run(df) -> float:
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            return time.time() - t0

        run(verify(jac_old)), run(verify(jac_new))  # warm both plans
        olds, news = [], []
        for _ in range(4):
            olds.append(run(verify(jac_old)))
            news.append(run(verify(jac_new)))
        row = {
            "docs": n_shingled,
            "candidates": n_cands,
            "union_verify_s": round(min(olds), 3),
            "sized_verify_s": round(min(news), 3),
            "runs_union": [round(t, 3) for t in olds],
            "runs_sized": [round(t, 3) for t in news],
        }
        results[f"x{scale}"] = row
        print(f"x{scale}: {row}", flush=True)
        shingled.unpersist()
        cands.unpersist()

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
        "verify_stage_probe.json",
    )
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
