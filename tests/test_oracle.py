"""Differential test: every registered query vs its DuckDB oracle at
sf0.001 — the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from tests.compare import assert_frames_match
from tests.conftest import SF_DIR


def _registry():
    from stockmarketdata_dwb_etl_spark import registry

    registry.load_all()
    return registry


def pytest_generate_tests(metafunc):
    if "query_name" in metafunc.fixturenames:
        reg = _registry()
        metafunc.parametrize("query_name", sorted(reg.QUERIES))


def test_query_vs_oracle(query_name, spark, duck):
    reg = _registry()
    sdf = reg.QUERIES[query_name](spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    if query_name not in reg.ORACLE:
        # rows-only contract: must run and produce a stable schema
        assert spark_pdf.shape[1] > 0
        return
    oracle_pdf = duck.execute(reg.ORACLE[query_name]).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, query_name)
