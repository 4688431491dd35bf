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
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) catalog table.

    Sorting within buckets lets the bucketed SortMergeJoin skip its sort
    as well — scan → merge, nothing else.
    """
    w = df.write.bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
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
