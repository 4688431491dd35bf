"""Bucketed table layout — co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-fact join (orders ⨝ lineitem) is
shuffling both sides on the key. Writing both tables bucketed on the
join key with the same bucket count puts co-joined rows in matching
buckets at rest, so Catalyst plans a SortMergeJoin with NO Exchange on
either side — the join cost collapses to a per-bucket merge.

Spark's bucketing needs the session catalog (``saveAsTable``); the
bucket spec lives in table metadata, not in the parquet files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) catalog table.

    Sorting within buckets lets the bucketed SortMergeJoin skip its sort
    as well — scan → merge, nothing else. ``path`` makes the table
    EXTERNAL at an explicit location — use it when the session's default
    warehouse directory (relative to the driver's cwd in local mode)
    isn't a sane place to write.
    """
    w = df.write.bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    if path is not None:
        w = w.option("path", path)
        # an external table's metadata survives even if a previous run's
        # files are gone; drop it so overwrite starts clean
        df.sparkSession.sql(f"DROP TABLE IF EXISTS {table_name}")
    w.mode(mode).format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on the bucket key."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
