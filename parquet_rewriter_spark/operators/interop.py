"""Interop export: publish a snapshot as a Hive-style symlink manifest.

External engines that speak plain parquet but not this table's manifest
protocol (Presto/Trino/Athena/Hive via ``SymlinkTextInputFormat``) can
still read a CONSISTENT snapshot if we hand them the classic Delta
escape hatch: a ``_symlink_format_manifest/manifest.txt`` listing the
absolute paths of exactly the files that make up one committed version.
The listing is generated from the manifest — a driver-side metadata
fold, no data I/O — and is itself committed atomically (tmp + rename),
so a concurrent reader sees either the old file list or the new one,
never a torn mix.

Refusal over wrong answers: a snapshot with active deletion vectors or
a column-rename mapping CANNOT be represented as "just read these
files" — an external engine would resurrect tombstoned rows or see
physical column names. Exporting such a snapshot raises instead of
silently publishing corrupt data; materialize deletes (or read through
the native API) first.
"""

from __future__ import annotations

import os
from typing import Any

from parquet_rewriter_spark.table import SortedTable

MANIFEST_DIR = "_symlink_format_manifest"


def write_symlink_manifest(
    t: SortedTable, version: "int | str | None" = None
) -> dict[str, Any]:
    """Publish ``version`` (default: current; tags accepted) for
    external engines. Returns {path, num_files, rows, version}."""
    m = t.manifest(version)
    if m.dv_files:
        raise ValueError(
            "snapshot has merge-on-read deletion vectors; an external "
            "engine reading raw files would resurrect deleted rows — "
            "materialize deletes before exporting a symlink manifest"
        )
    if m.rename_map:
        raise ValueError(
            "snapshot has renamed columns (physical names differ from "
            "logical); external engines would see physical names — "
            "read through the native API instead"
        )
    out_dir = os.path.join(t.path, MANIFEST_DIR)
    os.makedirs(out_dir, exist_ok=True)
    listing = "".join(
        os.path.abspath(os.path.join(t.path, e.name)) + "\n" for e in m.files
    )
    dst = os.path.join(out_dir, "manifest.txt")
    tmp = dst + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(listing)
    os.replace(tmp, dst)
    return {
        "path": dst,
        "num_files": len(m.files),
        "rows": sum(e.rows for e in m.files),
        "version": m.version,
    }


def read_symlink_manifest(spark, table_path: str):
    """What an external engine does: read exactly the listed files."""
    with open(os.path.join(table_path, MANIFEST_DIR, "manifest.txt")) as fh:
        paths = [line.strip() for line in fh if line.strip()]
    if not paths:
        raise ValueError(f"empty symlink manifest at {table_path}")
    return spark.read.parquet(*paths)
