"""Column profiling — per-column data-quality statistics in one
aggregation pass, long-format output (column, metric, value).

The intake step of every training-data pipeline: before cleaning 100 TB
you profile it. Everything is computed in ONE Tungsten aggregate over
the scan (no per-column jobs, no driver loop over columns — the metric
fan-out happens in the projection, the aggregation is a single
partial+final hash agg), then unpivoted with ``stack`` which is a
zero-shuffle generator.

``exact_distinct=False`` (default) uses HyperLogLog++
(approx_count_distinct) — the only choice at 100 TB; ``True`` computes
exact count(DISTINCT) per column, which Spark expands,
one shuffle per distinct column — acceptable for the oracle gate,
ruinous at scale (the docstring IS the warning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_numeric(
    df: DataFrame,
    cols: list[str],
    exact_distinct: bool = False,
    ndigits: int = 4,
) -> DataFrame:
    """(column, metric, value) for numeric columns: n_rows, n_null,
    n_distinct, min, max, mean. All doubles, rounded for cross-engine
    comparability."""
    aggs = []
    for c in cols:
        col = F.col(c)
        nd = (
            F.count_distinct(col)
            if exact_distinct
            else F.approx_count_distinct(col)
        )
        aggs += [
            F.count(F.lit(1)).cast("double").alias(f"{c}__n_rows"),
            F.sum(col.isNull().cast("long")).cast("double").alias(f"{c}__n_null"),
            nd.cast("double").alias(f"{c}__n_distinct"),
            F.round(F.min(col).cast("double"), ndigits).alias(f"{c}__min"),
            F.round(F.max(col).cast("double"), ndigits).alias(f"{c}__max"),
            F.round(F.avg(col), ndigits).alias(f"{c}__mean"),
        ]
    one = df.agg(*aggs)
    metrics = ["n_rows", "n_null", "n_distinct", "min", "max", "mean"]
    stack_args = ", ".join(
        f"'{c}', '{m}', `{c}__{m}`" for c in cols for m in metrics
    )
    n = len(cols) * len(metrics)
    return one.selectExpr(
        f"stack({n}, {stack_args}) as (column, metric, value)"
    )
