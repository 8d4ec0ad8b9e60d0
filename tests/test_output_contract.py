"""Output-contract audit over the FULL registry: no query may emit a
top-level array/map/struct column.

The external driver canonicalizes results with pandas ``sort_values`` /
``factorize`` over every output column; a nested cell crashes it with
"unhashable type: 'list'" (q_one_hot_encode, CORRECTNESS_r08). This audit
calls each BATCH query function to obtain its output schema — no result
is collected, but plan-BUILD itself may run real Spark jobs for queries
that materialize scratch caches in their bodies (q_dedup_index_probe
writes its parquet MinHash index; roundtrip/bucketed queries write and
re-read scratch tables). q_stream_* entries are excluded because calling
them runs a full micro-batch replay, and driver_sim's toPandas path
already routes their output through the same rejection check. The audit
fails on any nested top-level output type, so the whole class is
impossible to reintroduce.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from tests.conftest import SF_DIR


def _all_query_schemas(spark):
    import __spark_entry__ as ent

    failures = []
    schemas = {}
    for name, fn in ent.queries().items():
        if name.startswith("q_stream_"):
            continue
        try:
            schemas[name] = fn(spark, SF_DIR).schema
        except Exception as exc:  # noqa: BLE001 — plan-build failure is its own bug
            failures.append(f"{name}: plan build failed: {exc}")
    return schemas, failures


def test_no_nested_toplevel_output_columns(spark):
    schemas, failures = _all_query_schemas(spark)
    assert not failures, failures[:5]
    bad = [
        f"{name}.{f.name}: {f.dataType.simpleString()}"
        for name, schema in schemas.items()
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        "nested top-level output columns break the driver's pandas-sort"
        f" canonicalizer; emit strings or bitmasks instead: {bad}"
    )


def test_compare_rejects_list_columns():
    import pandas as pd

    from tests.compare import assert_frames_match

    df = pd.DataFrame({"k": [1], "v": [[1, 0]]})
    with pytest.raises(AssertionError, match="sort_values canonicalizer"):
        assert_frames_match(df, df.copy(), "synthetic")


def test_compare_catches_sub_1e6_float_divergence():
    """The r08 q_feature_scale class: a sub-1e-6 value divergence passed
    the old 4dp canon but failed the driver's hash. The 9dp canon must
    catch it in-repo."""
    import pandas as pd

    from tests.compare import assert_frames_match

    a = pd.DataFrame({"k": [1], "v": [0.1234567]})
    b = pd.DataFrame({"k": [1], "v": [0.12345677]})
    assert round(0.1234567, 4) == round(0.12345677, 4)  # old canon blind
    with pytest.raises(AssertionError, match="value mismatch"):
        assert_frames_match(a, b, "synthetic-lowbits")
