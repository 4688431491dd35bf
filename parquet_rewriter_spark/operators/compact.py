"""Compaction — the reference's bulk re-chunk loop (R15).

Reference: rewrite 100% of row groups at a new target size via
``while(isNextBlockAvailable()){loadAndMutateNextBlock(); flushMutatedBlock();}``
(ParquetRewriter.java:196-199, 222-234). Spark-first equivalent: one
distributed job — read everything, range-repartition on the key,
sorted write, manifest flip. Catalyst/AQE pick the scan parallelism;
``repartitionByRange`` samples the key distribution so output files are
size-balanced even under key skew.
"""

from __future__ import annotations

from parquet_rewriter_spark.table import Manifest, SortedTable


def compact(
    table: SortedTable,
    max_records_per_file: int,
    num_files: int | None = None,
) -> dict:
    """Rewrite the whole table at a new file/row-group size."""
    m = table.manifest()
    df = table.read()
    staging = table._write_sorted(df, m.key, max_records_per_file, num_files)
    entries = table._adopt_staged(staging, m.key)
    table._commit_manifest(
        Manifest(
            version=m.version + 1,
            key=m.key,
            files=sorted(entries, key=lambda e: (e.key_min, e.name)),
            schema_json=m.schema_json or df.schema.json(),
        )
    )
    return {
        "version": m.version + 1,
        "files_before": len(m.files),
        "files_after": len(entries),
        "rows": sum(e.rows for e in entries),
    }
