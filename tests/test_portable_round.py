"""Cross-engine determinism of the portable floor-form round.

Engine-native ROUND(double, n) is a per-fixture lottery at 4dp half
boundaries (Spark: BigDecimal HALF_UP on the shortest decimal repr;
DuckDB: scaled-double rounding — observed flip: q_stochastic, sf0.1,
35.74135 -> 35.7414 vs 35.7413). Every oracle-checked double round in
the repo now uses ``floor(x*10^n + 0.5)/10^n`` on BOTH engines
(functions/exact.py::portable_round + the matching SQL fragment); this
test pins the contract on the exact adversarial inputs: half-boundary
values, their double neighbors, negatives, and large magnitudes.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from stockmarketdata_dwb_etl_spark.functions.exact import (
    portable_round,
    sql_portable_round,
)

# Adversarial doubles: exact 4dp half boundaries (where native ROUND
# diverges per engine), representation neighbors, negatives, scale.
CASES = [
    35.74135,  # the observed q_stochastic flip value
    0.00005,
    0.12345,
    -0.12345,
    1.00005,
    -1.00005,
    2.5,
    -2.5,
    123456.78905,
    0.1 + 0.2,  # 0.30000000000000004
    1e12 + 0.00005,
    0.0,
]


@pytest.mark.parametrize("nd", [0, 2, 4, 6])
def test_portable_round_matches_duckdb_bitwise(spark, nd):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(v,) for v in CASES], "x double")
    got = [
        r[0]
        for r in df.select(portable_round(F.col("x"), nd)).collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute(f"SELECT {sql_portable_round('?::DOUBLE', nd)}", [v]).fetchone()[0]
        for v in CASES
    ]
    # bit-identical, not approx: the whole point of the floor form
    assert got == want


@pytest.mark.parametrize("nd", [2, 4])
def test_portable_round_matches_python_floor_form(spark, nd):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(v,) for v in CASES], "x double")
    got = [
        r[0]
        for r in df.select(portable_round(F.col("x"), nd)).collect()
    ]
    scale = float(10**nd)
    want = [math.floor(v * scale + 0.5) / scale for v in CASES]
    assert got == want


def test_portable_round_accepts_str_and_defaults_to_int(spark):
    import pyspark.sql.functions as F  # noqa: F401

    df = spark.createDataFrame([(2.5,), (3.49,)], "x double")
    got = sorted(r[0] for r in df.select(portable_round("x")).collect())
    assert got == [3.0, 3.0]
