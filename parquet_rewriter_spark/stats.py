"""Zone-map (per-file key min/max) collection from Parquet footers.

This is the Spark-side analog of the reference's ``loadStats``
(ParquetRewriter.java:239-251), which pulls the key column's min/max
``Statistics`` per row group and hard-fails when absent. Two changes,
both deliberate (SURVEY.md §2.1 R2/R5):

- granularity is the **file**, not the row group — Spark cannot splice
  row groups into an existing file, so the unit of passthrough/rewrite
  is a part-file;
- keys are typed (long/string/...), not signed-lexicographic binary —
  we do NOT replicate the reference's deprecated
  ``parquet.strings.signed-min-max.enabled`` quirk
  (ParquetRewriter.java:97).

Scale note (100 TB): footer reads are driver-side only below
``DISTRIBUTED_THRESHOLD`` files; above it they run as a Spark job over
the file list so a million-file table never serializes footer I/O on
the driver. Tables maintained by this engine carry the same ranges in a
manifest sidecar (table.py) so steady-state merges read **zero** footers.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Iterator

import pyarrow.parquet as pq
from pyspark.sql import SparkSession

DISTRIBUTED_THRESHOLD = 4096


@dataclass(frozen=True)
class FileStats:
    """Key-column zone map for one Parquet part-file, plus optional
    SECONDARY column zone maps (``col_stats``: col → (min, max))."""

    path: str
    num_rows: int
    num_bytes: int
    key_min: Any
    key_max: Any
    col_stats: dict = field(default_factory=dict)


def _decode_raw_stat(raw: Any, col_schema) -> Any:
    """Typed value from a raw physical statistic pyarrow refuses to
    cast: Spark writes precision ≤ 18 decimals with INT32/INT64
    physical type, whose statistics raise ArrowNotImplementedError on
    ``st.min``/``st.max`` — the unscaled integer (or big-endian
    two's-complement bytes for FLBA/BYTE_ARRAY) is in ``min_raw``."""
    if col_schema.logical_type.type == "DECIMAL":
        import decimal

        unscaled = (
            int.from_bytes(raw, "big", signed=True)
            if isinstance(raw, bytes)
            else int(raw)
        )
        return decimal.Decimal(unscaled).scaleb(-col_schema.scale)
    raise ValueError(
        f"cannot decode statistics for column {col_schema.name!r} "
        f"({col_schema.logical_type})"
    )


def _footer_stats(path: str, key: str, stats_cols: tuple[str, ...] = ()) -> FileStats:
    f = pq.ParquetFile(path)
    md = f.metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    if key not in idx:
        raise ValueError(f"key column {key!r} not in {path}")

    def _minmax(col: int, required: bool) -> tuple[Any, Any] | None:
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col).statistics
            if st is None or not st.has_min_max:
                if required:
                    # Same contract as the reference: no stats on the key
                    # column is a hard error (ParquetRewriter.java:246-249).
                    raise ValueError(
                        f"missing min/max statistics for {key!r} in {path} row group {rg}"
                    )
                return None  # secondary stats are best-effort (no pruning)
            try:
                mn, mx = st.min, st.max
            except Exception:  # noqa: BLE001 - int-physical decimal stats
                cs = md.schema.column(col)
                mn = _decode_raw_stat(st.min_raw, cs)
                mx = _decode_raw_stat(st.max_raw, cs)
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
        return lo, hi

    kmin, kmax = _minmax(idx[key], required=True)
    col_stats: dict = {}
    for c in stats_cols:
        if c == key or c not in idx:
            continue  # absent column (pre-schema-evolution file): no stats → never pruned
        mm = _minmax(idx[c], required=False)
        if mm is not None:
            col_stats[c] = mm
    size = os.path.getsize(path)
    return FileStats(
        path=path,
        num_rows=md.num_rows,
        num_bytes=size,
        key_min=kmin,
        key_max=kmax,
        col_stats=col_stats,
    )


def list_parquet_files(table_path: str) -> list[str]:
    if os.path.isfile(table_path):
        return [table_path]
    out = []
    for root, dirs, files in os.walk(table_path):
        # metadata/sidecar subtrees (_changelog, _staging-*, _temporary)
        # are not data files — vacuum must never sweep them
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for fn in files:
            if fn.endswith(".parquet") and not fn.startswith(("_", ".")):
                out.append(os.path.join(root, fn))
    return sorted(out)


def collect_file_stats(
    spark: SparkSession,
    table_path: str,
    key: str,
    files: list[str] | None = None,
    stats_cols: tuple[str, ...] | list[str] = (),
) -> list[FileStats]:
    """Per-file key zone maps; distributed above DISTRIBUTED_THRESHOLD files."""
    from parquet_rewriter_spark.ship import ensure_shipped

    ensure_shipped(spark)  # workers unpickle module-level helpers

    files = files if files is not None else list_parquet_files(table_path)
    stats_cols = tuple(stats_cols)
    if len(files) <= DISTRIBUTED_THRESHOLD:
        return [_footer_stats(p, key, stats_cols) for p in files]
    # Distributed footer scan: ship the file list, read footers on executors.
    sc = spark.sparkContext
    n_slices = max(1, len(files) // 64)

    def part(paths: Iterator[str]) -> Iterator[tuple]:
        for p in paths:
            s = _footer_stats(p, key, stats_cols)
            yield (s.path, s.num_rows, s.num_bytes, s.key_min, s.key_max, s.col_stats)

    rows = sc.parallelize(files, n_slices).mapPartitions(part).collect()
    return [FileStats(*r) for r in sorted(rows)]


def column_storage_report(spark: "SparkSession", paths: list[str]) -> "DataFrame":
    """Per-column physical storage totals from parquet FOOTERS only —
    which columns dominate bytes and how well they compress. At 100 TB
    this is the first question a storage bill raises, and footers answer
    it without touching a data page: the walk is a distributed job over
    the FILE LIST (one ~KB footer read per file), per-chunk partials
    aggregate JVM-side.

    Returns (column, n_chunks, n_values, compressed_bytes,
    uncompressed_bytes) — exact integers, engine-portable: DuckDB's
    ``parquet_metadata()`` replays the same footer walk row-for-row,
    which is what the catalog oracle does.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    files = spark.createDataFrame([(p,) for p in paths], "path string")
    n = max(1, min(len(paths), spark.sparkContext.defaultParallelism))

    def walk(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for p in pdf["path"]:
                md = pq.ParquetFile(p).metadata
                for rg in range(md.num_row_groups):
                    rgm = md.row_group(rg)
                    for ci in range(rgm.num_columns):
                        cc = rgm.column(ci)
                        out.append(
                            (
                                cc.path_in_schema,
                                int(cc.num_values),
                                int(cc.total_compressed_size),
                                int(cc.total_uncompressed_size),
                            )
                        )
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[
                        "column", "n_values",
                        "compressed_bytes", "uncompressed_bytes",
                    ],
                )

    chunks = files.repartition(n).mapInPandas(
        walk,
        "column string, n_values long, compressed_bytes long, "
        "uncompressed_bytes long",
    )
    return (
        chunks.groupBy("column")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_values").alias("n_values"),
            F.sum("compressed_bytes").alias("compressed_bytes"),
            F.sum("uncompressed_bytes").alias("uncompressed_bytes"),
        )
        .orderBy("column")
    )
