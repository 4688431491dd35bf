"""Training-sequence packing: assign documents to fixed-token windows.

LLM pretraining consumes fixed-length sequences (2k/4k/8k tokens);
the corpus is packed by CONCATENATING documents in a deterministic
order and CUTTING every ``max_tokens`` — a document may span a
boundary (the standard packing; avoids the padding waste of
one-doc-per-sequence and the NP-hard bin packing of no-split
variants).

Scale shape: a global concatenation order would be one giant window —
a single-partition sort, the classic scale-killer. Packing instead
happens WITHIN SHARDS: docs hash into ``num_shards`` independent
streams, each packed by one window over (shard) — shards are the unit
of parallelism, the window shuffle is a balanced hash exchange, and
training jobs consume shards independently (they shuffle sequences
globally anyway). Every assignment is a pure function of (doc ids,
token counts), so re-runs, retries, and the SQL oracle all agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def pack_sequences(
    docs: DataFrame,
    id_col: str,
    tokens_col: str | Column,
    max_tokens: int,
    num_shards: int = 64,
    shard_col: Column | None = None,
) -> DataFrame:
    """Assign each doc its position in the packed token stream.

    Returns the input plus: ``shard`` (hash bucket of the id),
    ``seq_id`` (which fixed-size window the doc STARTS in, within its
    shard), ``seq_offset`` (token offset of the doc inside that window)
    and ``spans_boundary`` (doc crosses into the next window and will be
    split by the materializer).

    ``tokens_col`` may be a column name or an expression (e.g. a
    whitespace token count). ``shard_col`` overrides the default
    xxhash64 hash bucket — e.g. a modulo of a numeric id when the
    assignment must be replayable outside Spark.
    """
    tokens = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    shard = (
        shard_col
        if shard_col is not None
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_shards))
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        docs.withColumn("shard", shard)
        .withColumn("__tok", tokens.cast("long"))
        .withColumn("__before", F.coalesce(F.sum("__tok").over(w), F.lit(0)))
    )
    return (
        out.withColumn("seq_id", (F.col("__before") / max_tokens).cast("long"))
        .withColumn("seq_offset", F.col("__before") % max_tokens)
        .withColumn(
            "spans_boundary",
            (F.col("seq_offset") + F.col("__tok")) > F.lit(max_tokens),
        )
        .drop("__tok", "__before")
    )
