"""Training-shard export: balanced shard assignment + partitioned write.

The last step of an LLM data pipeline is materializing the cleaned
corpus as N training shards with roughly equal token counts, so data
loaders stream shards of uniform cost. Two naive shardings both fail:

- ``hash(doc_id) % N`` balances document COUNTS, but token counts are
  heavy-tailed — a shard that catches a few giant docs runs long;
- global ``row_number() OVER (ORDER BY tokens DESC)`` then round-robin
  (longest-processing-time order) balances well but the bare window is
  a single-partition sort — the classic scale-killer.

This operator keeps the LPT-style balance and drops the scale problem:
the descending-size total order comes from the range-partitioned
contiguous-id assignment (``operators/ids.py`` — one range shuffle +
a bounded per-partition offset pass, identical output to the global
``row_number``), and the shard is ``rank % n_shards``. Round-robin in
descending size order interleaves the heavy tail across every shard;
imbalance is bounded by one document's tokens per shard.

The assignment is fully deterministic (total order on
``(-size, *tiebreak)``), so the DuckDB oracle replays it exactly with
a window function, and re-running on a re-partitioned input yields the
same shards (asserted in tests).

``write_shards`` materializes ``shard=K/`` parquet directories via a
dynamic-partition write — one job, shard-partitioned layout, which is
exactly what a sequential shard reader wants at 100 TB.

Reference provenance: the reference ends at sorted parquet output
(ParquetRewriter.java:196-214 write+roll); shard export is north-star
surface for the training-pipeline mandate (SURVEY.md §2.2 LLM table).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from parquet_rewriter_spark.operators.ids import assign_contiguous_ids


def assign_shards(
    df: DataFrame,
    n_shards: int,
    size_col: str,
    tiebreak_cols: Sequence[str],
    shard_col: str = "shard",
) -> DataFrame:
    """Add ``shard_col`` ∈ [0, n_shards): round-robin over the
    descending-``size_col`` total order (ties broken by
    ``tiebreak_cols``, which must make the order unique).

    Equals ``(row_number() OVER (ORDER BY size DESC, tiebreak) - 1)
    % n_shards`` without the single-partition sort.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    neg = "_neg_size_for_shard"
    ranked = assign_contiguous_ids(
        df.withColumn(neg, -F.col(size_col)),
        order_cols=[neg, *tiebreak_cols],
        id_col="_shard_rank",
    )
    return (
        ranked.withColumn(shard_col, (F.col("_shard_rank") % n_shards).cast("int"))
        .drop(neg, "_shard_rank")
    )


def shard_summary(sharded: DataFrame, size_col: str, shard_col: str = "shard") -> DataFrame:
    """Per-shard balance report: doc count + total size."""
    return (
        sharded.groupBy(shard_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(size_col).alias("total_size"),
        )
        .orderBy(shard_col)
    )


def write_shards(
    sharded: DataFrame,
    path: str,
    shard_col: str = "shard",
) -> None:
    """Materialize ``shard=K/`` directories. Dynamic partition
    overwrite: a re-export of a subset of shards replaces only those
    directories (sources/sinks.py semantics)."""
    (
        sharded.repartition(shard_col)  # one file set per shard dir
        .write.partitionBy(shard_col)
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(path)
    )


def write_jsonl_shards(
    sharded: DataFrame,
    path: str,
    shard_col: str = "shard",
    order_cols: tuple[str, ...] = (),
) -> None:
    """Materialize shards as JSON-LINES — the wire format most training
    data loaders (and WebDataset-style pipelines) actually ingest.
    Same dynamic-partition layout as :func:`write_shards`
    (``shard=K/`` directories, one file set per shard), but each row is
    one JSON object per line via Spark's native JSON sink — no Python
    in the writer path. ``order_cols`` sorts rows WITHIN each shard
    (sortWithinPartitions — no global sort), giving loaders a
    deterministic stream order."""
    out = sharded.repartition(shard_col)
    if order_cols:
        out = out.sortWithinPartitions(shard_col, *order_cols)
    (
        out.write.partitionBy(shard_col)
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .json(path)
    )
