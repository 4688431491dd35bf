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

import os
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


def write_webdataset_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    payload_col: str,
    ext: str,
    meta_cols: Sequence[str] = (),
    n_shards: int = 8,
    size_col: str | None = None,
) -> DataFrame:
    """Materialize WebDataset-style tar shards — the archive format
    multimodal training loaders stream: each sample is two adjacent tar
    members, ``<key>.<ext>`` (the raw payload bytes) and ``<key>.json``
    (the metadata columns), samples grouped per tar so a loader reads
    one sequential file per shard.

    Scale shape: shard balance comes from :func:`assign_shards` over
    the payload byte length (or ``size_col``) — no single-partition
    window. ``repartitionByRange`` on the shard id puts EQUAL shard
    values in exactly one task (range partitioning colocates equal
    keys), so each tar has exactly one writer, and the writer streams
    Arrow batches into the archive — memory is bounded by a batch, not
    a shard. Tars are written to a temp name and renamed on task
    success; rows are sorted by key within the shard for deterministic
    member order.

    Returns the lazily-computed report ``(shard, n_samples,
    payload_bytes, path)`` — sample counts and payload byte totals are
    pure functions of the deterministic shard assignment, which is what
    the catalog oracle replays in SQL.

    Payloads must be BinaryType or StringType (strings are UTF-8
    encoded). The sandbox has no image libs, but the tar plumbing is
    format-agnostic: a decoded-JPEG corpus exports identically.

    ``out_dir`` must be a filesystem every executor can write (shared
    POSIX mount / fuse-mounted object store) — the same contract every
    WebDataset creation pipeline has; tars are not written through the
    Spark committer because tar is not a splittable Spark sink.
    """
    import pandas as pd

    from parquet_rewriter_spark.ship import ensure_shipped

    # self-configure on externally-built sessions: the tar writer runs
    # in Python workers, which need this package importable (the
    # SortedTable constructor does the same for the merge kernels)
    ensure_shipped(df.sparkSession)
    # prune to the exported columns BEFORE the ranking pass: the shard
    # assignment crosses a Python stage, so Catalyst cannot push this
    # projection through it — without the explicit select every unused
    # column of a wide corpus would ride both shuffles
    df = df.select(key_col, payload_col, *meta_cols)
    sized = df.withColumn(
        "__wds_sz",
        F.col(size_col) if size_col is not None
        # octet_length, not length: strings shard by their UTF-8 BYTE
        # size (what actually lands in the tar), not character count
        else F.octet_length(F.col(payload_col)).cast("long"),
    )
    sharded = assign_shards(sized, n_shards, "__wds_sz", [key_col])
    cols = [key_col, payload_col, *meta_cols, "shard"]
    # Exact one-shard-per-task placement WITHOUT repartitionByRange:
    # the shard domain is known a priori (0..n_shards-1), so remapping
    # each id to a constant whose Murmur3 pmods to its own partition
    # (merge._identity_remap) gives range partitioning's colocation
    # with none of its sampling job — which would re-execute the whole
    # shard-assignment pass (including its Python ranking stage) just
    # to rediscover bounds we already know.
    from parquet_rewriter_spark.operators.merge import _identity_remap

    remap = _identity_remap(n_shards)
    part = F.element_at(
        F.array(*[F.lit(int(v)) for v in remap]), F.col("shard") + 1
    )
    data = (
        sharded.select(*cols)
        .withColumn("__wds_part", part)
        .repartition(n_shards, F.col("__wds_part"))
        .drop("__wds_part")
        .sortWithinPartitions("shard", key_col)
    )
    os.makedirs(out_dir, exist_ok=True)
    meta_list = list(meta_cols)

    def write(batches):
        import io
        import json as _json
        import tarfile
        import uuid as _uuid

        tars: dict[int, tarfile.TarFile] = {}
        tmp_names: dict[int, str] = {}
        stats: dict[int, list[int]] = {}  # shard -> [n_samples, bytes]
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                d = row._asdict()
                sh = int(d["shard"])
                if sh not in tars:
                    tmp = os.path.join(
                        out_dir, f".shard-{sh:05d}.tar.tmp-{_uuid.uuid4().hex}"
                    )
                    tars[sh] = tarfile.open(tmp, "w")
                    tmp_names[sh] = tmp
                    stats[sh] = [0, 0]
                key = d[key_col]
                payload = d[payload_col]
                if isinstance(payload, str):
                    payload = payload.encode("utf-8")
                payload = bytes(payload)
                for name, blob in (
                    (f"{key}.{ext}", payload),
                    (
                        f"{key}.json",
                        _json.dumps(
                            {m: _jsonable(d[m]) for m in meta_list},
                            sort_keys=True,
                        ).encode("utf-8"),
                    ),
                ):
                    info = tarfile.TarInfo(name=name)
                    info.size = len(blob)
                    info.mtime = 0  # deterministic archives
                    tars[sh].addfile(info, io.BytesIO(blob))
                stats[sh][0] += 1
                stats[sh][1] += len(payload)
        out_rows = []
        for sh, tf in tars.items():
            tf.close()
            final = os.path.join(out_dir, f"shard-{sh:05d}.tar")
            os.replace(tmp_names[sh], final)
            out_rows.append((sh, stats[sh][0], stats[sh][1], final))
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=["shard", "n_samples", "payload_bytes", "path"]
            )

    return data.mapInPandas(
        write, "shard int, n_samples long, payload_bytes long, path string"
    )


def _jsonable(v):
    """numpy / pandas scalars → plain JSON types for the .json member."""
    import numpy as np

    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, (np.ndarray, list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, bytes):
        return v.hex()
    return v


def read_webdataset(spark, path_glob: str) -> DataFrame:
    """Read WebDataset tar shards back as a DataFrame of
    ``(shard_path, key, payload, meta)`` — the loader side of
    :func:`write_webdataset_shards`, and an ingest path for tar corpora
    produced elsewhere.

    Scale shape: ``binaryFile`` lists the archives; each task un-tars
    the shards it owns with the stdlib, pairing ``<key>.<ext>`` payload
    members with their ``<key>.json`` metadata member. One tar is one
    sequential read (tar has no random access — exactly why loaders
    stream whole shards), so parallelism = number of shards, the same
    contract WebDataset loaders have. Payload stays opaque bytes;
    ``meta`` is the raw JSON string for ``from_json``/VARIANT downstream.

    Tar members are read from the in-memory file CONTENT delivered by
    binaryFile (archives are shard-sized by construction); a corpus of
    multi-GB tars should be re-sharded smaller — also true of every
    WebDataset pipeline.
    """
    import pandas as pd

    from parquet_rewriter_spark.ship import ensure_shipped

    ensure_shipped(spark)
    files = spark.read.format("binaryFile").load(path_glob)

    def untar(batches):
        import io
        import tarfile

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                d = row._asdict()
                out = []
                metas = {}
                payloads = {}
                with tarfile.open(fileobj=io.BytesIO(d["content"])) as tf:
                    for m in tf.getmembers():
                        key, ext = m.name.rsplit(".", 1)
                        blob = tf.extractfile(m).read()
                        if ext == "json":
                            metas[key] = blob.decode("utf-8")
                        else:
                            payloads[key] = blob
                for key, payload in payloads.items():
                    out.append(
                        (d["path"], key, payload, metas.get(key))
                    )
                if out:
                    yield pd.DataFrame(
                        out, columns=["shard_path", "key", "payload", "meta"]
                    )

    return (
        files.select("path", "content")
        .mapInPandas(
            untar,
            "shard_path string, key string, payload binary, meta string",
        )
    )
