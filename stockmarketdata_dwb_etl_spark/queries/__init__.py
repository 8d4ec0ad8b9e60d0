"""Import every query module so registry decorators run.

Registry order is what the external driver walks front-to-back under its
entry budget (round 1 stopped after exactly 50 entries). The authoritative
ordering now lives in ``registry.PRIORITY``: after these imports,
``registry.load_all()`` rotates a curated cross-family cross-section to
the front of the dicts so ANY cap depth yields evidence across the whole
surface; queries not in PRIORITY keep this module order after them.
"""

from stockmarketdata_dwb_etl_spark.queries import (  # noqa: F401
    joins,
    windows,
    scalars,
    reports,
    storage,
    udfs,
    sources_q,
    pipeline_q,
    streaming_q,
    reports2,
    reports3,
    analytics2,
    timeseries2,
    graph,
    finance,
    finance2,
    finance3,
    finance4,
    finance5,
    finance6,
    finance7,
    finance8,
    dataops6,
    dataops7,
    dataops8,
    dataops9,
    stats_q,
    stats_q2,
    relational,
    dataops5,
    timeseries3,
    analytics3,
    analytics4,
    dataops3,
    dataops4,
    timeseries,
    sketches,
    aggregates,
    analytics,
    core,
    dataops,
    dataops2,
    dataops10,
    dataops11,
    dataops12,
    dataops13,
    dataops14,
)
