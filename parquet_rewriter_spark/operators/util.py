"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_factor: float = 0.5) -> DataFrame:
    """Repartition up if the input is under-partitioned relative to the
    cluster's parallelism. CPU-heavy per-row operators (minhash
    signatures, simhash, media decode) otherwise run on however few
    partitions the scan produced — a single small parquet file gives 1-2
    partitions and leaves the rest of the cluster idle. At real scale
    inputs arrive well-partitioned and this is a no-op."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        # physical-plan partitioning, no RDD conversion (df.rdd builds
        # the whole Python RDD wrapper per call — measurably slower on
        # wide plans, the round-1 review's hot-path nit)
        n = df._jdf.queryExecution().executedPlan().outputPartitioning().numPartitions()
    except Exception:  # noqa: BLE001 - AQE/unknown partitioning: fall back
        n = 0
    if n <= 0:
        # UnknownPartitioning (parquet scans, AQE wrappers) reports 0
        # partitions without raising — a non-positive count is "unknown",
        # not "empty"; only then pay for the RDD conversion
        n = df.rdd.getNumPartitions()
    if n < target * min_factor:
        return df.repartition(target)
    return df
