"""Driver contract for the spark-graft builder (PySpark target).

Delegates to ``parquet_rewriter_spark.catalog`` — the engine's declared
query surface. Each catalog entry is a (Spark builder, DuckDB oracle
SQL) pair; the driver runs both at sf=0.01 and hash-compares values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from parquet_rewriter_spark import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: star-join revenue by
    nation (broadcast dims + one shuffle agg)."""
    return catalog.get("revenue_by_nation").fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
