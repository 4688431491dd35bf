from parquet_rewriter_spark.plans.inspect import (
    count_exchanges,
    has_broadcast_join,
    plan_of,
    plan_report,
    pushed_filters,
    read_schema,
)

__all__ = [
    "count_exchanges",
    "has_broadcast_join",
    "plan_of",
    "plan_report",
    "pushed_filters",
    "read_schema",
]
