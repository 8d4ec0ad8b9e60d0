"""Physical-plan shape assertions — the 100 TB posture, checked on real
explain output rather than asserted in prose. A regression that un-pushes a
filter, drops a broadcast, or sneaks a row-at-a-time Python UDF into a hot
path fails here long before it would show up in a benchmark."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _queries():
    from stockmarketdata_dwb_etl_spark import registry

    registry.load_all()
    return registry.QUERIES


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(_queries()["q_filter_pred"](spark, SF_DIR))
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert pushed.strip(), "no filters pushed into the parquet scan"


def test_projection_prunes_scan_columns(spark):
    plan = _plan(_queries()["q_scan_project"](spark, SF_DIR))
    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    # the query projects 4 lineitem columns; the scan must not read others
    assert "l_comment" not in read_schema
    assert read_schema.count(":") <= 5, read_schema


def test_broadcast_join_is_broadcast(spark):
    plan = _plan(_queries()["q_join_broadcast"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_orderby_limit_is_take_ordered(spark):
    plan = _plan(_queries()["q_orderby_limit"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, "global sort materialized for top-k"


def test_groupby_aggregates_partially(spark):
    df = _queries()["q_agg_groupby"](spark, SF_DIR)
    plan = _plan(df)
    # partial (map-side) + final HashAggregate, and the date filter pushed
    assert plan.count("HashAggregate") >= 2
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "LessThanOrEqual(l_shipdate" in plan
    # codegen spans only appear in the final adaptive plan: execute, re-read
    df.collect()
    final = _plan(df)
    assert "*(" in final, "no WholeStageCodegen span in the flagship agg"


def test_tpch_q5_broadcasts_dims(spark):
    plan = _plan(_queries()["q_tpch_q5"](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 3


@pytest.mark.parametrize(
    "name",
    sorted(
        n
        for n in _queries()
        if not n.startswith("q_stream_")  # construction runs a real stream
        and n
        not in {
            "q_csv_roundtrip",  # write-heavy construction; plan is a re-read
            "q_partitioned_write",
            "q_bucketed_join",
            "q_json_source",
            "q_orc_roundtrip",
            "q_compact_small_files",
        }
    ),
)
def test_no_row_at_a_time_python(spark, name):
    """Engine-wide invariant: Python reaches the JVM boundary only through
    Arrow (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) — a
    BatchEvalPython node means a row-at-a-time UDF crept into a hot path."""
    plan = _plan(_queries()[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, f"{name} uses a row-at-a-time Python UDF"


def test_tpch_q6_pushes_all_predicates(spark):
    plan = _plan(_queries()["q_tpch_q6"](spark, SF_DIR))
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} predicate not pushed: {pushed}"


def test_tpch_q18_aggregates_before_join(spark):
    """The HAVING reduction must run on lineitem BEFORE the orders join
    (aggregate below join in the plan tree), so the join input is ~1% of
    lineitem — the ordering that matters at 100 TB."""
    plan = _plan(_queries()["q_tpch_q18"](spark, SF_DIR))
    first_join = min(
        i for i in (plan.find("SortMergeJoin"), plan.find("BroadcastHashJoin"),
                    plan.find("ShuffledHashJoin")) if i >= 0
    )
    agg_positions = [
        i for i in range(len(plan)) if plan.startswith("HashAggregate", i)
    ]
    assert any(i > first_join for i in agg_positions), (
        "no aggregate below the first join — HAVING reduction ran after joins"
    )
