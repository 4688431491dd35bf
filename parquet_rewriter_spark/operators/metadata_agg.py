"""Metadata-only aggregates: answer count/min/max from the manifest.

The classic table-format fast path (Iceberg answers ``count(*)`` from
manifest file stats; Delta from the transaction log): a snapshot's
manifest already carries per-file row counts, tight key bounds, and the
secondary zone maps ``read_where`` prunes with — so the aggregates they
imply need **zero file opens and zero Spark jobs**.  At 100 TB this is
the difference between a sub-millisecond driver-side dict lookup and a
full scan of a million parquet footers.

Exactness rules (each reported alongside the value, never silently):

* ``rows`` is ALWAYS exact: every commit path (create/merge/compact/DV
  delete) records per-file row counts, and merge-on-read deletes record
  per-file ``dv_rows`` tombstone counts — live rows = rows − dv_rows.
* key / zone-map ``min``/``max`` are exact only while the snapshot has
  **no deletion vectors**: a tombstone may hide the extreme row inside a
  file, so under MoR the manifest bounds are conservative *bounds*, not
  values.  We still return them, flagged ``bounds_exact=False``.
* a secondary column's min/max is only reported when EVERY live file
  carries a zone map for it (a file written before the column was added
  to ``stats_cols`` has no entry — its rows are unbounded).

Reference tie: the manifest *is* the reference's per-block statistics
index (``ParquetRewriter.java`` seeks by block metadata instead of
scanning); this operator turns the same statistics into query answers
instead of just pruning decisions.
"""
from __future__ import annotations

from typing import Any

from parquet_rewriter_spark.table import Manifest, SortedTable


def metadata_aggregate(
    t: SortedTable, version: int | None = None
) -> dict[str, Any]:
    """Aggregate a snapshot purely from its manifest (no I/O, no jobs).

    Returns a dict::

        {
          "version", "metadata_only": True,
          "rows", "rows_exact": True,        # always exact, see module doc
          "num_files", "bytes",
          "bounds_exact",                    # False when DVs are active
          "key": {"name", "min", "max"},     # logical name under renames
          "columns": {logical: {"min","max"}, ...}   # full-coverage only
        }
    """
    m: Manifest = t.manifest(version)
    dv_rows = sum(e.dv_rows for e in m.files)
    rows = sum(e.rows for e in m.files) - dv_rows
    rename = m.rename_map or {}

    out: dict[str, Any] = {
        "version": m.version,
        "metadata_only": True,
        "rows": rows,
        "rows_exact": True,
        "num_files": len(m.files),
        "bytes": sum(e.bytes for e in m.files),
        "bounds_exact": dv_rows == 0,
        "key": None,
        "columns": {},
    }
    if m.files:
        out["key"] = {
            "name": rename.get(m.key, m.key),
            "min": min(e.key_min for e in m.files),
            "max": max(e.key_max for e in m.files),
        }
        for pcol in m.stats_cols:
            stats = [e.col_stats.get(pcol) for e in m.files]
            if any(s is None or len(s) != 2 for s in stats):
                continue  # a file predates this zone map → no safe answer
            out["columns"][rename.get(pcol, pcol)] = {
                "min": min(s[0] for s in stats),
                "max": max(s[1] for s in stats),
            }
    return out
