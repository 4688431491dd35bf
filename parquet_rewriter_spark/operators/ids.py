"""Contiguous global ID assignment without a single-partition sort.

A training pipeline needs stable, dense row ids (shard/sequence
numbering, example ids for dedup bookkeeping). The naive
``row_number() OVER (ORDER BY key)`` funnels the whole table through
ONE task — the classic scale-killer. ``monotonically_increasing_id``
scales but is neither dense nor stable across layouts.

The scalable pattern (RDD ``zipWithIndex``, rebuilt DataFrame-native):

1. range-partition + sort by the order key — one shuffle, the same
   total order a global sort would produce, but split across N tasks;
2. count rows per partition — a bounded N-row aggregate collected to
   the driver (N = partition count, never data-sized);
3. cumulative-sum the counts into per-partition START OFFSETS;
4. one Arrow-batched ``mapInPandas`` pass adds ``offset + local index``
   per partition — no further shuffle, preserves the sorted order.

The order key must be a TOTAL order (unique tuple) — ties spanning a
partition boundary would make the assignment layout-dependent. The
result equals ``row_number() OVER (ORDER BY cols) - 1`` exactly, which
is what the DuckDB oracle checks.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import DataFrame, functions as F


def assign_contiguous_ids(
    df: DataFrame,
    order_cols: Sequence[str],
    id_col: str = "stable_id",
    num_partitions: int | None = None,
) -> DataFrame:
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .localCheckpoint(eager=False)
        # checkpoint pins ONE materialization: the count pass and the id
        # pass must see identical partition contents (RangePartitioner
        # re-samples per job otherwise). Cost = one executor-local write
        # of the already-shuffled data, not a second shuffle.
    )
    pid = F.spark_partition_id()
    counts = {
        r["p"]: r["c"]
        for r in part.groupBy(pid.alias("p")).agg(F.count(F.lit(1)).alias("c")).collect()
    }  # bounded: one row per partition
    offsets: dict[int, int] = {}
    acc = 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    out_schema = part.withColumn(id_col, F.lit(0).cast("long")).schema
    bc = spark.sparkContext.broadcast(offsets)

    def add_ids(pdfs: Iterator) -> Iterator:
        # one partition per call-sequence; TaskContext gives its id
        from pyspark import TaskContext

        import numpy as np

        base = bc.value.get(TaskContext.get().partitionId(), 0)
        seen = 0
        for pdf in pdfs:
            pdf[id_col] = np.arange(base + seen, base + seen + len(pdf), dtype="int64")
            seen += len(pdf)
            yield pdf

    return part.mapInPandas(add_ids, schema=out_schema)
