"""parquet_rewriter_spark — a PySpark-native analytics engine with the
capabilities of Factual/parquet-rewriter, rebuilt Spark-first.

The reference (/root/reference, ~1,050 LoC Java) incrementally mutates
key-sorted Parquet files: raw passthrough of clean row groups +
sort-merge rewrite of dirty ones (ParquetRewriter.java:312-322, 253-301).
This package re-expresses that as DataFrame transformations:

- ``table``       sorted Parquet table layout + key-range manifest
- ``stats``       footer zone-map collection (the analog of loadStats,
                  ParquetRewriter.java:239-251)
- ``operators``   merge/upsert/delete/compact, dedup, similarity,
                  as-of / range joins, top-k
- ``functions``   text analysis, vector math, JSON helpers
- ``sources``     table readers, multimodal binary columns
- ``streaming``   Structured Streaming surface (windows, stateful dedup)

Everything is plain PySpark (DataFrame/SQL); Catalyst supplies predicate
pushdown, pruning, join planning, AQE. No RDDs, no custom Catalyst rules.
"""

__version__ = "0.1.0"

from parquet_rewriter_spark.session import get_spark  # noqa: F401
