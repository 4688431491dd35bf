"""Layout-health introspection from the manifest — the input a
compaction/Z-order scheduler needs, at O(files) driver cost with no
data read (the same arithmetic-only discipline as
operators/compact.py:compact_incremental's planning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from parquet_rewriter_spark.table import SortedTable


def table_layout_report(table: SortedTable, target_rows: int | None = None) -> DataFrame:
    """One-row layout summary: file/row/byte totals, fill factor vs the
    target, small-file count, and key-range overlap depth (max number
    of files a single key probe can hit — 1 on a perfectly layered
    table; growth means merges are fragmenting the key space and a
    compaction is due).
    """
    m = table.manifest()
    files = m.files
    n = len(files)
    rows = sum(e.rows for e in files)
    size = sum(e.bytes for e in files)
    tgt = target_rows or max((e.rows for e in files), default=1)
    small = sum(1 for e in files if e.rows < tgt * 0.5)
    # overlap depth: sweep the sorted bounds; files are few enough that
    # the O(n log n) driver pass is free (vectorize past ~10^6 entries)
    events = []
    for e in files:
        events.append((e.key_min, 0))
        events.append((e.key_max, 1))
    depth = max_depth = 0
    for _, kind in sorted(events, key=lambda t: (t[0], t[1])):
        if kind == 0:
            depth += 1
            max_depth = max(max_depth, depth)
        else:
            depth -= 1
    row = {
        "version": m.version,
        "n_files": n,
        "n_rows": rows,
        "total_bytes": size,
        "avg_rows_per_file": round(rows / n, 1) if n else 0.0,
        "fill_factor": round(rows / (n * tgt), 4) if n else 0.0,
        "n_small_files": small,
        "max_key_overlap_depth": max_depth,
        "n_dv_tombstones": sum(e.dv_rows for e in files),
    }
    return table.spark.createDataFrame([row])
