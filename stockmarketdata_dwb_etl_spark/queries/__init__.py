"""Import every query module so registry decorators run."""

from stockmarketdata_dwb_etl_spark.queries import (  # noqa: F401
    aggregates,
    analytics,
    core,
    dataops,
    dataops2,
    joins,
    pipeline_q,
    reports,
    scalars,
    sources_q,
    storage,
    streaming_q,
    udfs,
    windows,
)
