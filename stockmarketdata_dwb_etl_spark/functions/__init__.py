from stockmarketdata_dwb_etl_spark.functions.exact import exact_avg, exact_sum  # noqa: F401
