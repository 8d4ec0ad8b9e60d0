"""Landing-layout tests: the re-chunked scratch copy behind
catalog._splittable_path (single-row-group fixture files cannot
parallelize their scans; the landing copy restores row-group
splittability without changing logical content or row order)."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

from stockmarketdata_dwb_etl_spark.catalog import (
    _RECHUNK_MIN_BYTES,
    _splittable_path,
)


def _write_fixture(dirpath: str, name: str, n_rows: int) -> str:
    os.makedirs(dirpath, exist_ok=True)
    tbl = pa.table(
        {
            "k": pa.array(range(n_rows), type=pa.int64()),
            "pad": pa.array([os.urandom(16).hex() for _ in range(n_rows)]),
        }
    )
    path = os.path.join(dirpath, f"{name}.parquet")
    # one giant row group, like the driver-generated fixtures
    pq.write_table(tbl, path, row_group_size=n_rows)
    return path


def test_rechunk_preserves_rows_and_order(tmp_path, monkeypatch):
    import stockmarketdata_dwb_etl_spark.scratch as scratch

    monkeypatch.setattr(scratch, "SCRATCH", str(tmp_path / "scratch"))
    sf_dir = str(tmp_path / "sf")
    src = _write_fixture(sf_dir, "lineitem", 60_000)
    assert os.stat(src).st_size >= _RECHUNK_MIN_BYTES, "fixture too small for test"

    out = _splittable_path(sf_dir, "lineitem")
    assert out != src and os.path.isdir(out)
    parts = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert len(parts) >= 2  # splittable now
    # logical content identical AND in original order (sequential slices)
    got = pa.concat_tables([pq.read_table(p) for p in parts])
    assert got.column("k").to_pylist() == list(range(60_000))
    # idempotent: second call reuses the landed copy
    assert _splittable_path(sf_dir, "lineitem") == out


def test_rechunk_increases_scan_parallelism(tmp_path, monkeypatch, spark):
    """The point of the landing copy: a single-row-group fixture scan has
    ONE effective task no matter how Spark byte-range-splits the file
    (every split but the one holding the row-group start reads nothing),
    while the re-chunked copy spreads rows across tasks."""
    import stockmarketdata_dwb_etl_spark.scratch as scratch

    monkeypatch.setattr(scratch, "SCRATCH", str(tmp_path / "scratch"))
    sf_dir = str(tmp_path / "sf")
    src = _write_fixture(sf_dir, "lineitem", 60_000)
    out = _splittable_path(sf_dir, "lineitem")
    assert out != src

    def n_effective_tasks(path: str) -> int:
        df = spark.read.parquet(path)
        counts = df.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
        return sum(1 for c in counts if c > 0)

    assert n_effective_tasks(src) == 1
    assert n_effective_tasks(out) >= 2


def test_small_and_multifile_tables_pass_through(tmp_path, monkeypatch):
    import stockmarketdata_dwb_etl_spark.scratch as scratch

    monkeypatch.setattr(scratch, "SCRATCH", str(tmp_path / "scratch"))
    sf_dir = str(tmp_path / "sf")
    small = _write_fixture(sf_dir, "nation", 10)
    assert _splittable_path(sf_dir, "nation") == small
    # directory-style datasets (e.g. scale-probe Spark writes) untouched
    os.makedirs(os.path.join(sf_dir, "orders.parquet"))
    assert _splittable_path(sf_dir, "orders") == os.path.join(
        sf_dir, "orders.parquet"
    )


def test_rechunk_env_opt_out(tmp_path, monkeypatch):
    import stockmarketdata_dwb_etl_spark.scratch as scratch

    monkeypatch.setattr(scratch, "SCRATCH", str(tmp_path / "scratch"))
    monkeypatch.setenv("SPARK_GRAFT_NO_RECHUNK", "1")
    sf_dir = str(tmp_path / "sf")
    src = _write_fixture(sf_dir, "lineitem", 60_000)
    assert _splittable_path(sf_dir, "lineitem") == src
