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


def local_df(spark, data, schema) -> DataFrame:
    """``createDataFrame`` for DRIVER-LOCAL batches, partitioned by the
    batch's ACTUAL size instead of ``defaultParallelism``: Spark slices
    a local list over every core (a 1-row batch becomes 32 near-empty
    partitions), and every downstream stage of a mutation/probe plan
    inherits that width — 32 tasks, and 32 Python-worker round trips
    wherever an Arrow eval sits on the path, to move one row. Rows per
    partition is sized so typical probe/mutation batches stay a handful
    of tasks while a deliberately large local batch still spreads: the
    cap is the session's own parallelism, so at cluster scale this
    NEVER narrows a big batch below what createDataFrame would pick."""
    data = list(data)
    n = max(1, min(
        spark.sparkContext.defaultParallelism,
        -(-len(data) // 4096),  # ceil: ≥4096 rows per partition
    ))
    # explicit numSlices via parallelize — NOT .coalesce(n): coalescing
    # a 32-slice parallelized collection measures ~5 s per action on
    # local[32] (vs 0.3 s for a right-sized parallelize), and coalesce
    # leaves 31 empty parent partitions in the lineage
    return spark.createDataFrame(
        spark.sparkContext.parallelize(data, n), schema
    )


def attach_caches(out: DataFrame, *caches: DataFrame) -> DataFrame:
    """Record internally-persisted relations on the RETURNED DataFrame
    (``out._pr_caches``) so callers outside the catalog's sweep
    decorators have a public release handle (:func:`release_caches`)
    instead of enumerating the session's private persistent-RDD map.
    Caches attached by upstream stages compose."""
    out._pr_caches = list(caches) + list(getattr(out, "_pr_caches", []))
    return out


def release_caches(df: DataFrame) -> int:
    """Unpersist every cache an operator attached to ``df`` via
    :func:`attach_caches` — and ONLY those: a concurrent query's
    persists or lineage-truncating localCheckpoints are never touched
    (sweeping by persistent-RDD-id diff could drop another job's
    blocks). Returns the number released; idempotent."""
    caches = getattr(df, "_pr_caches", [])
    for c in caches:
        c.unpersist(False)
    df._pr_caches = []
    return len(caches)
