"""Physical-plan audit: extract the scale-relevant facts from a
DataFrame's executed plan.

Every fact here is something that changes the 100 TB bill: a filter that
did not reach the scan re-reads the table; an unaccounted exchange is a
cluster-wide shuffle; a BatchEvalPython node is a row-at-a-time Python
boundary (10-100× slower than the Arrow path); a missing codegen span
means an interpreted operator in the hot loop. tests/test_plans.py holds
named queries to these invariants; scripts/plan_audit.py reports them
for the whole registry.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

#: Plan nodes that cross the Python boundary row-at-a-time (bad) vs via
#: Arrow batches (acceptable when semantics require Python).
_ROW_PYTHON = ("BatchEvalPython",)
_ARROW_PYTHON = (
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapGroupsInPandasWithState",
    "MapInArrow",
    "BatchEvalPythonUDTF",
    "ArrowEvalPythonUDTF",
)
_JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


@dataclass
class PlanAudit:
    """Scale-relevant facts extracted from one executed plan."""

    pushed_filters: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    n_exchanges: int = 0
    n_broadcast_exchanges: int = 0
    joins: list[str] = field(default_factory=list)
    n_codegen_spans: int = 0
    row_python_nodes: int = 0
    arrow_python_nodes: int = 0
    n_scans: int = 0
    has_take_ordered: bool = False
    n_hash_aggregates: int = 0

    @property
    def python_is_arrow_only(self) -> bool:
        return self.row_python_nodes == 0


def _final_plan_only(plan: str) -> str:
    """Drop AQE '== Initial Plan ==' sections: after execution the plan
    string prints the final plan followed by the pre-AQE initial plan,
    which would double-count every node."""
    out, skipping = [], False
    for line in plan.splitlines():
        if "== Initial Plan ==" in line:
            skipping = True
            continue
        if "== Final Plan ==" in line:
            skipping = False
            continue
        if not skipping:
            out.append(line)
    return "\n".join(out)


def audit(df: DataFrame) -> PlanAudit:
    """Audit a DataFrame's executed plan (final AQE plan if the DataFrame
    has been executed; the initial physical plan otherwise)."""
    plan = _final_plan_only(df._jdf.queryExecution().executedPlan().toString())
    a = PlanAudit()
    # the plan printer truncates long lines ("..."), sometimes inside the
    # filter list itself — accept either a closing bracket or a truncation
    for m in re.finditer(r"PushedFilters: \[(.*?)(?:\]|\.\.\.)", plan):
        if m.group(1).strip():
            a.pushed_filters.append(m.group(1).strip())
    for m in re.finditer(r"PartitionFilters: \[(.*?)(?:\]|\.\.\.)", plan):
        if m.group(1).strip():
            a.partition_filters.append(m.group(1).strip())
    for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan):
        a.read_schemas.append(m.group(1))
    # "Exchange hashpartitioning/rangepartitioning/..." = a real shuffle;
    # BroadcastExchange ships a small side to every executor (cheap, counted
    # separately).
    a.n_exchanges = len(re.findall(r"Exchange (?!SinglePartition)", plan)) - plan.count(
        "BroadcastExchange"
    )
    a.n_broadcast_exchanges = plan.count("BroadcastExchange")
    for node in _JOIN_NODES:
        a.joins += [node] * plan.count(node)
    a.n_codegen_spans = len(set(re.findall(r"\*\((\d+)\)", plan)))
    a.row_python_nodes = sum(plan.count(n) for n in _ROW_PYTHON)
    a.arrow_python_nodes = sum(plan.count(n) for n in _ARROW_PYTHON)
    a.n_scans = plan.count("FileScan") + plan.count("BatchScan")
    a.has_take_ordered = "TakeOrderedAndProject" in plan
    a.n_hash_aggregates = plan.count("HashAggregate")
    return a
