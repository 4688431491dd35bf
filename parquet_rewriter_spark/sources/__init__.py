from parquet_rewriter_spark.sources.readers import TABLE_NAMES, load_table, register_views  # noqa: F401
