"""stockmarketdata_dwb_etl_spark — a PySpark-native analytics engine.

Brand-new engine providing, natively on Spark, the ingestion/transform
semantics of the reference ETL pipeline (guptatavish/StockMarketData-DWB-ETL)
plus the OHLCV-warehouse analytical query surface the reference delegates to
its warehouse, extended with large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Design: DataFrame-first, Catalyst-optimized, no driver-side collect loops in
any operator. See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"
