"""Z-order layout (operators/zorder.py): the clustered copy must hold
exactly the source rows, and its parquet footer min/max stats must let a
2-D box predicate skip files in BOTH dimensions — the property a
single-column sort cannot provide."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from stockmarketdata_dwb_etl_spark.queries.storage import write_orders_zordered

SF_DIR = "/root/testdata/sf0.001"


def _file_ranges(path: str, cols: list[str]):
    """[(file, {col: (min, max)})] from parquet footers — what any
    stats-based reader consults before touching data pages."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ranges = {}
        for c in cols:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            ranges[c] = (lo, hi)
        out.append((f, ranges))
    return out


def test_zorder_preserves_rows_and_prunes_both_dims(spark):
    zpath = write_orders_zordered(spark, SF_DIR, n_files=16)

    src = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    z = spark.read.parquet(zpath)
    assert z.count() == src.count()
    assert (
        z.select(F.sum("o_orderkey")).collect()[0][0]
        == src.select(F.sum("o_orderkey")).collect()[0][0]
    )

    files = _file_ranges(zpath, ["o_custkey", "o_totalprice"])
    assert len(files) == 16

    # the q_zorder_pruning box, scaled to sf0.001's key range
    def survives(ranges, ck=(100, 260), tp=(50000.0, 120000.0)) -> bool:
        (clo, chi), (tlo, thi) = ranges["o_custkey"], ranges["o_totalprice"]
        return not (chi < ck[0] or clo > ck[1] or thi < tp[0] or tlo > tp[1])

    kept = sum(1 for _, r in files if survives(r))
    # box covers ~10% of custkeys x ~14% of the price span: a z-ordered
    # layout must skip well over half the files on footer stats alone
    assert kept <= len(files) // 2, f"no multi-dim pruning: {kept}/{len(files)} files survive"

    # and each dimension individually clusters: files must not all span
    # the full custkey domain (the failure mode of sorting on one column)
    full_span = sum(
        1
        for _, r in files
        if r["o_custkey"][0] <= 10 and r["o_custkey"][1] >= 140
    )
    assert full_span < len(files), "custkey does not cluster at all"
