"""SparkSession factory with engine defaults.

Local-mode testing uses ``local[N]``; the same configs are what we would
ship on a real cluster (AQE on, adaptive coalescing/skew-join on). The
only local-specific knob is shuffle partitions sized to the core count
instead of a cluster-scale value.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Engine defaults — cluster-safe; these matter at 100 TB:
#  - AQE re-plans joins at runtime (broadcast small post-filter sides,
#    split skewed partitions) — the moral equivalent of the reference's
#    "only touch dirty row groups" adaptivity, applied to shuffles.
#  - Arrow execution keeps the Pandas-UDF path (our only Python hot
#    paths: similarity + multimodal) batch-columnar.
#  - nanosAsLong: the events fixture carries TIMESTAMP(NANOS), which
#    Spark's vectorized reader refuses; we read it as long and convert
#    (see sources.readers.load_table).
ENGINE_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # runtime bloom-filter join pruning: when one join side carries a
    # selective filter, inject a bloom filter of its join keys into the
    # OTHER side's scan — rows that can't match die before the shuffle.
    # Inert on local fixtures (creation-side threshold keeps it off for
    # tiny inputs); at 100 TB it's the semi-join-reduction analog of the
    # reference's dirty-file pruning. Injection behavior is pinned in
    # tests/test_plans.py with lowered thresholds.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # INT64-micros timestamps (INT96 has no usable footer stats and is
    # deprecated; micros match the oracle's / pyarrow's unit)
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    # Generated-class cache: default 100 entries. A session that runs
    # many distinct wide plans (the bench: 90+ queries, several codegen
    # stages each) evicts and RECOMPILES constantly; each entry is just
    # a classloader reference, so a few thousand is cheap and makes
    # repeated plan shapes hit compiled code.
    "spark.sql.codegen.cache.maxEntries": "4096",
    # File listing: past this many paths Spark launches a DISTRIBUTED
    # listing job — measured ~250 ms of fixed latency per multi-file
    # read on local[32] (a merge reading 80 dirty files pays it every
    # time). Driver-side serial listing handles thousands of local/HDFS
    # getFileStatus calls in milliseconds; the distributed path only
    # pays off at object-store listing latencies × very large manifests,
    # which 2048 still permits.
    "spark.sql.sources.parallelPartitionDiscovery.threshold": "2048",
}


def get_spark(
    app_name: str = "parquet_rewriter_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    so tests and bench share one sizing knob.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from parquet_rewriter_spark.ship import ensure_shipped

    ensure_shipped(spark)
    return spark
