"""Plan inspection & audit: the engine's own view of Catalyst output.

The reference has no plan layer at all (SURVEY.md §4 — eager pandas);
this package is where the Spark engine watches the plans Catalyst gives
it and holds them to the 100 TB posture (pushdown reached the scan,
exchanges are accounted for, Python only crosses via Arrow).
"""

from stockmarketdata_dwb_etl_spark.plans.audit import PlanAudit, audit  # noqa: F401
