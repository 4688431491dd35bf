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

from parquet_rewriter_spark.operators.sampling import portable_unit


def pack_sequences(
    docs: DataFrame,
    id_col: str,
    tokens_col: str | Column,
    max_tokens: int,
    num_shards: int = 64,
    shard_col: Column | None = None,
    start_offsets: DataFrame | None = None,
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

    ``start_offsets`` makes packing INCREMENTAL: a (shard, base_off)
    relation — :func:`shard_next_offsets` of everything packed so far
    — shifts each shard's cumulative sums, so appending a new corpus
    increment continues every shard's token stream exactly where the
    previous pack stopped instead of repacking history (the append
    path of a growing pretraining corpus; pack-then-append equals the
    one-shot pack of the union, oracled). The relation is
    num_shards-bounded, joined broadcast.
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
    if start_offsets is not None:
        out = (
            out.join(
                F.broadcast(start_offsets.select("shard", "base_off")),
                "shard",
                "left",
            )
            .withColumn(
                "__before",
                F.col("__before") + F.coalesce(F.col("base_off"), F.lit(0)),
            )
            .drop("base_off")
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


def shard_next_offsets(
    docs: DataFrame,
    id_col: str,
    tokens_col: str | Column,
    num_shards: int = 64,
    shard_col: Column | None = None,
    start_offsets: DataFrame | None = None,
) -> DataFrame:
    """(shard, base_off): total tokens packed per shard so far — one
    map-side-combined aggregate over the packed increment, folded onto
    the previous offsets if given. Feed the result to
    :func:`pack_sequences`'s ``start_offsets`` to pack the NEXT corpus
    increment without touching history. num_shards rows, trivially
    persistable as the packing manifest of a growing corpus."""
    tokens = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    shard = (
        shard_col
        if shard_col is not None
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_shards))
    )
    totals = (
        docs.select(shard.alias("shard"), tokens.cast("long").alias("__tok"))
        .groupBy("shard")
        .agg(F.sum("__tok").alias("base_off"))
    )
    if start_offsets is None:
        return totals
    prev = start_offsets.select("shard", F.col("base_off").alias("__prev"))
    return (
        totals.join(prev, "shard", "full")
        .select(
            "shard",
            (
                F.coalesce(F.col("base_off"), F.lit(0))
                + F.coalesce(F.col("__prev"), F.lit(0))
            ).alias("base_off"),
        )
    )


def _pow2_ladder(min_bucket: int, max_bucket: int) -> list[int]:
    ladder, b = [], max(min_bucket, 1)
    while b < max_bucket:
        ladder.append(b)
        b *= 2
    ladder.append(max_bucket)
    return ladder


def length_bucket_batches(
    docs: DataFrame,
    id_col: str,
    tokens_col: str | Column,
    batch_tokens: int,
    min_bucket: int = 16,
    max_bucket: int = 1024,
    num_shards: int = 8,
    shard_col: Column | None = None,
) -> DataFrame:
    """Length-bucketed batch assembly — the NO-SPLIT alternative to
    :func:`pack_sequences` for fine-tuning / inference workloads where
    documents must stay whole and batches are padded to a common
    length: docs bucket into a power-of-two length ladder
    (min_bucket, 2·min_bucket, …, max_bucket), and within a bucket,
    batches of ``floor(batch_tokens / bucket_len)`` sequences fill in
    deterministic hash order. Padding waste is bounded by construction
    (a doc pads to at most 2× its length, minus one token), versus the
    unbucketed worst case of padding everything to the global max.

    The ladder is a CASE chain over integer comparisons — no float
    log2, whose edge behavior at exact powers of two differs between
    engines — so bucket assignment is bit-replayable in SQL. Docs
    longer than ``max_bucket`` clamp to the top rung (they'd be
    truncated by the materializer; ``padded`` is 0 for them).

    Scale shape: assignment is a pure projection; the only shuffle is
    the (bucket, shard) window — ``num_shards`` hash shards per bucket
    keep one giant bucket from serializing through a single task
    (the same sharding contract as pack_sequences; batch ids are per
    (bucket, shard), which training consumers treat as independent
    streams). ``shard_col`` overrides the default xxhash64 shard for
    SQL-replayable assignments (e.g. ``pmod(id, num_shards)``).

    Returns the input plus ``bucket_len``, ``shard``, ``batch_id``,
    ``padded`` (tokens of padding this doc costs its batch slot)."""
    tokens = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    ladder = _pow2_ladder(min_bucket, max_bucket)
    bucket = F.lit(ladder[-1])
    for rung in reversed(ladder[:-1]):
        bucket = F.when(tokens <= rung, F.lit(rung)).otherwise(bucket)
    shard = (
        shard_col
        if shard_col is not None
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_shards))
    )
    out = (
        docs.withColumn("__tok", tokens.cast("long"))
        .withColumn("bucket_len", bucket.cast("long"))
        .withColumn("shard", shard)
    )
    cap = F.greatest(
        F.floor(F.lit(batch_tokens) / F.col("bucket_len")), F.lit(1)
    )
    w = Window.partitionBy("bucket_len", "shard").orderBy(
        portable_unit(F.col(id_col)), F.col(id_col)
    )
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .withColumn("batch_id", F.floor((F.col("__rn") - 1) / cap))
        .withColumn(
            "padded",
            F.greatest(F.col("bucket_len") - F.col("__tok"), F.lit(0)),
        )
        .drop("__tok", "__rn")
    )


def completion_loss_spans(
    win: DataFrame,
    spans_col: str = "doc_spans",
    out_col: str = "loss_spans",
) -> DataFrame:
    """SFT LOSS-MASK spans: instruction tuning trains only on
    COMPLETION tokens — prompt tokens are masked out of the loss. Each
    packed doc's id stream is ``prompt_ids ++ completion_ids (++
    EOS)``, and word-level tokenization makes that concatenation exact
    (encoding is per-word, so the prompt's token count is a pure
    function of the prompt text alone). Given windows whose
    ``doc_spans`` carry a STRUCT doc ref with a ``prompt_len`` field
    (pack with ``doc_col`` pointing at ``struct(doc_id, prompt_len)``
    — the materializer preserves the doc column's type), each
    fragment's loss region is the intersection of its doc positions
    [doc_off, doc_off+len) with the completion region [prompt_len, ∞),
    shifted into window coordinates:

        skip = max(0, prompt_len − doc_off)
        loss = (start + skip, len − skip)        # dropped when empty

    Adds ``out_col`` (array<struct<start, len>> in window order, empty
    fragments filtered) and ``n_loss_tokens``. PURE CODEGEN over the
    spans already in the row — zero exchange, zero Python, no join:
    the prompt length rides inside the doc ref, so the mask derives
    locally in any engine. EOS lands in the loss region by
    construction (appended after the completion, standard practice)."""
    L0 = F.lit(0).cast("long")

    def one(s):
        skip = F.greatest(L0, s.doc.prompt_len - s.doc_off)
        return F.struct(
            (s.start + skip).alias("start"),
            F.greatest(L0, s.len - skip).alias("len"),
        )

    spans = F.filter(
        F.transform(F.col(spans_col), one), lambda x: x.len > 0
    )
    return win.withColumn(out_col, spans).withColumn(
        "n_loss_tokens",
        F.aggregate(F.col(out_col), L0, lambda acc, x: acc + x.len),
    )


# Default (shard → global key) stride for persisted packed windows:
# pack_key = shard · stride + seq_id. 2^40 windows/shard ≈ 4.5e18
# tokens at 4k-token windows — far beyond any corpus — while
# shard < 2^23 keeps the product inside a signed BIGINT.
PACK_KEY_STRIDE = 1 << 40


def persist_packed(
    windows: DataFrame,
    path: str,
    ids_col: str = "input_ids",
    key_stride: int = PACK_KEY_STRIDE,
    tag: str | None = None,
    max_records_per_file: int | None = None,
):
    """Persist :func:`materialize_packed`'s windows as a VERSIONED
    SortedTable — the registry discipline the tokenizer artifacts
    already get, extended to the training shards themselves: a
    reproducible training run needs the exact window set ON the
    engine's storage, with tags, time travel, and zone maps, not an
    ephemeral DataFrame. Keyed by ``pack_key = shard · key_stride +
    seq_id`` (integer, collision-free by construction, SQL-replayable)
    so the sorted write range-partitions by shard-then-sequence —
    training consumers read shard-contiguous files; (shard, seq_id)
    zone maps prune single-shard reads to that shard's files. Adds
    ``ids_digest`` (md5 of the comma-joined id stream) as a stored
    integrity column: a disjoint reader can verify a reloaded window
    against the digest without re-deriving the pipeline. ``tag`` pins
    the created snapshot (a tag survives any vacuum policy —
    ``read(tag)`` stays reproducible forever).

    Scale shape: one range exchange (the sorted write), no collect;
    everything else is pure projection."""
    from parquet_rewriter_spark.table import (
        DEFAULT_MAX_RECORDS_PER_FILE,
        SortedTable,
    )

    wd = windows.withColumn(
        "pack_key",
        (F.col("shard").cast("long") * F.lit(int(key_stride))
         + F.col("seq_id").cast("long")),
    ).withColumn(
        "ids_digest",
        F.md5(
            F.concat_ws(
                ",", F.transform(F.col(ids_col), lambda x: x.cast("string"))
            )
        ),
    )
    t = SortedTable.create(
        windows.sparkSession,
        path,
        wd,
        key="pack_key",
        max_records_per_file=(
            max_records_per_file or DEFAULT_MAX_RECORDS_PER_FILE
        ),
        stats_cols=["shard", "seq_id"],
    )
    if tag is not None:
        t.tag(tag)
    return t


def append_packed(
    table,
    win_inc: DataFrame,
    key_stride: int = PACK_KEY_STRIDE,
) -> dict:
    """Append a corpus INCREMENT's materialized windows to a persisted
    packed-shard table (:func:`persist_packed`) — the growing-corpus
    path: pack the increment with :func:`pack_sequences`
    ``start_offsets=`` (so its global offsets continue each shard's
    stream), materialize, then call this. Intersection semantics: the
    increment's FIRST window per shard may be the continuation of the
    table's last PARTIAL window — their arrays concatenate
    position-correctly by construction (materialize_packed's pieces
    are pos-sorted and the increment's in-window positions start
    exactly at the old fragment's length; doc_spans carry absolute
    in-window starts, so provenance concatenates too). Everything else
    is a plain insert. After this, the table equals the one-shot pack
    of the union bit-for-bit (oracled).

    Scale shape: the boundary windows are at most ONE KEY PER SHARD —
    fetched as num_shards zone-map-pruned point reads (the reference's
    R5 stats-pruned seek), never a table scan; the combine is a
    broadcast join against that num_shards-row relation; the write is
    one ``merge_into_table`` whose churn is the touched files only.
    Returns the merge report."""
    from functools import reduce

    from parquet_rewriter_spark.operators.merge import merge_into_table

    inc = win_inc.withColumn(
        "pack_key",
        (F.col("shard").cast("long") * F.lit(int(key_stride))
         + F.col("seq_id").cast("long")),
    )
    # the only windows that can already exist: each shard's FIRST
    # increment window (num_shards rows, collected as a plan constant)
    firsts = (
        inc.groupBy("shard").agg(F.min("seq_id").alias("seq_id")).collect()
    )
    keys = [
        int(r["shard"]) * int(key_stride) + int(r["seq_id"]) for r in firsts
    ]
    olds = [
        table.read_where({"pack_key": (k, k)}) for k in sorted(keys)
    ]
    old = (
        reduce(lambda a, b: a.unionByName(b), olds)
        if olds
        else table.read().limit(0)
    )
    o = old.select(
        "pack_key",
        F.col("input_ids").alias("__o_ids"),
        F.col("piece_lengths").alias("__o_pl"),
        *(
            [F.col("doc_spans").alias("__o_ds")]
            if "doc_spans" in old.columns
            else []
        ),
    )
    j = inc.join(F.broadcast(o), "pack_key", "left")
    has_old = F.col("__o_ids").isNotNull()
    ids = F.when(has_old, F.concat("__o_ids", "input_ids")).otherwise(
        F.col("input_ids")
    )
    pl = F.when(has_old, F.concat("__o_pl", "piece_lengths")).otherwise(
        F.col("piece_lengths")
    )
    cols = [
        F.col("pack_key"),
        F.col("shard"),
        F.col("seq_id"),
        ids.alias("input_ids"),
        F.size(ids).alias("n_tokens"),
        F.size(pl).cast("long").alias("n_pieces"),
        pl.alias("piece_lengths"),
    ]
    if "doc_spans" in win_inc.columns:
        ds = F.when(has_old, F.concat("__o_ds", "doc_spans")).otherwise(
            F.col("doc_spans")
        )
        cols.append(ds.alias("doc_spans"))
    cols.append(
        F.md5(
            F.concat_ws(",", F.transform(ids, lambda x: x.cast("string")))
        ).alias("ids_digest")
    )
    muts = j.select(*cols).withColumn("op", F.lit("UPSERT"))
    # column order must match the table schema
    muts = muts.select(*[c for c in table.read().columns], "op")
    return merge_into_table(table, muts)


def training_order(
    windows: DataFrame,
    shard_col: str = "shard",
    seq_col: str = "seq_id",
    salt: int = 0,
    out_col: str = "order_key",
) -> DataFrame:
    """DETERMINISTIC GLOBAL SHUFFLE ORDER for packed training windows
    — every production run consumes windows in a reproducible
    pseudo-random order, not document order (document order correlates
    adjacent windows by source/topic; SGD wants them scattered). Adds
    ``out_col`` = md5 of ``salt:shard:seq_id`` — a pure projection
    (zero exchange, zero Python) whose lexicographic order IS the
    training order contract: ORDER BY (order_key, shard, seq_id), the
    trailing columns a total tiebreak. md5 renders identical lowercase
    hex in Spark, DuckDB, and Python, so the order is engine-portable
    and a different ``salt`` per epoch gives an independent
    deterministic reshuffle.

    Scale shape: the order is a SORT KEY, not a materialized global
    rank — consumers range-partition on it (Spark's sort is a
    distributed range exchange), so no single-partition window ever
    exists; the key's first hex chars are uniform, so range splits are
    balanced by construction."""
    return windows.withColumn(
        out_col,
        F.md5(
            F.concat_ws(
                ":",
                F.lit(int(salt)).cast("string"),
                F.col(shard_col).cast("string"),
                F.col(seq_col).cast("string"),
            )
        ),
    )


def with_eos(
    docs: DataFrame,
    ids_col: str,
    eos_id: int,
) -> DataFrame:
    """Append the EOS special id to each document's token stream —
    the document separator every production packing pipeline inserts
    BEFORE the span arithmetic, so a training consumer can detect
    boundaries inside a packed window even without span metadata.

    The special-id RESERVATION convention (shared with the SQL
    replays): tokenizer artifacts assign dense piece ids 0..n−1, so
    ``eos_id = n`` (the artifact's row count) is the first free id —
    deterministic in any engine, no registry mutation needed. Pure
    projection: zero shuffle, zero Python."""
    return docs.withColumn(
        ids_col,
        F.concat(F.col(ids_col), F.array(F.lit(int(eos_id)).cast("int"))),
    )


def materialize_packed(
    packed: DataFrame,
    ids_col: str,
    max_tokens: int,
    doc_col: str | None = None,
) -> DataFrame:
    """Materialize :func:`pack_sequences`'s assignment into ACTUAL
    fixed-length training windows — the GPT-pretraining concat-and-cut,
    emitting real token-id arrays instead of accounting rows.

    ``packed`` is pack_sequences' output plus a token-id array column
    ``ids_col`` (e.g. operators/bpe.py:encode_docs). Each document
    contributes one SLICE per window it overlaps (computed from pure
    span arithmetic: global offset B = seq_id·M + seq_offset, length
    L = |ids|, window w gets ids[max(0, wM−B) .. min(L, (w+1)M−B))
    at in-window position B + a − wM); windows reassemble order-safely
    via array_sort over (position, piece) structs. Everything is
    codegen span math + one hash aggregate on (shard, window) — no
    Python, no collect; every window but a shard's last is exactly
    ``max_tokens`` long (asserted in tests).

    Returns (shard, seq_id, input_ids, n_tokens, n_pieces,
    piece_lengths) — ``piece_lengths`` lists each document fragment's
    token count in window order (they sum to ``n_tokens``), exactly
    what per-window attention-mask construction needs to stop
    attention at document boundaries inside a packed window.

    ``doc_col`` (the packed relation's document id) additionally emits
    ``doc_spans``: array<struct<doc, start, len>> in window order —
    the full provenance a training consumer needs to mask attention
    across document boundaries AND trace every window token back to
    its source document. Same single hash aggregate; the only extra
    state per window is one (doc, start, len) triple per fragment."""
    M = F.lit(max_tokens).cast("long")
    B = F.col("seq_id") * M + F.col("seq_offset")
    ids = F.col(ids_col)
    L = F.size(ids).cast("long")
    last_w = F.floor((B + L - F.lit(1)) / M).cast("long")
    pieces = F.transform(
        F.sequence(F.col("seq_id"), last_w),
        lambda w: F.struct(
            w.cast("long").alias("w"),
            F.slice(
                ids,
                (F.greatest(F.lit(0).cast("long"), w * M - B) + 1).cast("int"),
                (
                    F.least(L, (w + 1) * M - B)
                    - F.greatest(F.lit(0).cast("long"), w * M - B)
                ).cast("int"),
            ).alias("piece"),
            (B + F.greatest(F.lit(0).cast("long"), w * M - B) - w * M).alias("pos"),
            # the slice's offset WITHIN its document — what loss-mask
            # construction needs to know which doc positions a
            # fragment covers (a doc split across windows has one
            # fragment per window, each at a different doc offset)
            F.greatest(F.lit(0).cast("long"), w * M - B).alias("off"),
        ),
    )
    # keep the doc column's ORIGINAL type: the span struct's sort key
    # is pos (unique within a window), so the doc field's type is free
    # — a long cast here would silently NULL string/uuid doc ids,
    # losing exactly the provenance doc_spans exists to provide
    doc_cols = [F.col(doc_col).alias("docref")] if doc_col else []
    ex = (
        packed.where(L > 0)
        .select("shard", *doc_cols, F.explode(pieces).alias("p"))
        .select(
            "shard",
            *(["docref"] if doc_col else []),
            F.col("p.w").alias("seq_id"),
            F.col("p.pos"),
            F.col("p.piece"),
            F.col("p.off"),
        )
    )
    # ONE sorted collect per window (positions are unique within a
    # window, so (pos, ...) is a total order); every output column is
    # a pure transform of it
    item = (
        F.struct("pos", "docref", "off", "piece") if doc_col
        else F.struct("pos", "piece")
    )
    grouped = ex.groupBy("shard", "seq_id").agg(
        F.array_sort(F.collect_list(item)).alias("__arr")
    )
    arr = F.col("__arr")
    out_cols = [
        "shard",
        "seq_id",
        F.flatten(F.transform(arr, lambda s: s.piece)).alias("input_ids"),
        F.size(arr).cast("long").alias("n_pieces"),
        F.transform(arr, lambda s: F.size(s.piece)).alias("piece_lengths"),
    ]
    if doc_col:
        out_cols.append(
            F.transform(
                arr,
                lambda s: F.struct(
                    s.docref.alias("doc"),
                    s.pos.alias("start"),
                    F.size(s.piece).cast("long").alias("len"),
                    s.off.alias("doc_off"),
                ),
            ).alias("doc_spans")
        )
    sel = grouped.select(*out_cols)
    final = [
        "shard",
        "seq_id",
        "input_ids",
        F.size("input_ids").alias("n_tokens"),
        "n_pieces",
        "piece_lengths",
    ]
    if doc_col:
        final.append("doc_spans")
    return sel.select(*final)
