"""Partitioned Parquet sinks: overwrite / append / dynamic-partition.

SURVEY.md §2.2 sinks row. The reference commits by writing a brand-new
file and letting the caller swap paths (Mode.CREATE,
ParquetRewriter.java:115); for hive-partitioned layouts the idiomatic
Spark analog is dynamic partition overwrite — only partitions present
in the incoming frame are replaced, untouched partition directories are
passed through byte-identical (the file-granularity cousin of the raw
row-group passthrough at ParquetRewriter.java:317).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_PARTITION_OVERWRITE_KEY = "spark.sql.sources.partitionOverwriteMode"


@contextmanager
def _partition_overwrite_mode(spark, mode: str):
    old = spark.conf.get(_PARTITION_OVERWRITE_KEY, "static")
    spark.conf.set(_PARTITION_OVERWRITE_KEY, mode)
    try:
        yield
    finally:
        spark.conf.set(_PARTITION_OVERWRITE_KEY, old)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Write a hive-partitioned Parquet table (static overwrite/append)."""
    w = df.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int | None = None,
) -> None:
    """Dynamic partition overwrite: replace ONLY the partitions present
    in ``df``; every other partition's files are left untouched on disk.

    At 100 TB this is the difference between rewriting one day of an
    event log and rewriting the year: overwrite cost scales with the
    data carried by ``df``, never with the size of the existing table.
    """
    spark = df.sparkSession
    with _partition_overwrite_mode(spark, "dynamic"):
        w = df.write.mode("overwrite").partitionBy(*partition_cols)
        if max_records_per_file is not None:
            w = w.option("maxRecordsPerFile", str(max_records_per_file))
        w.parquet(path)


def drop_partition_dirs(spark, path: str, partition_col: str, values: list) -> int:
    """Remove the partition directories ``{path}/{partition_col}={v}``.

    Dynamic partition overwrite replaces only partitions PRESENT in the
    written frame — a maintained partition whose content shrinks to
    zero rows is never written, so its stale files would survive.
    Callers that reconcile a derived layout must drop such
    now-empty partitions explicitly. Uses the Hadoop FileSystem API, so
    it works on any supported storage, not just local disk. Returns the
    number of directories actually removed."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    removed = 0
    for v in values:
        p = jvm.org.apache.hadoop.fs.Path(f"{path}/{partition_col}={v}")
        fs = p.getFileSystem(conf)
        if fs.exists(p):
            fs.delete(p, True)
            removed += 1
    return removed
