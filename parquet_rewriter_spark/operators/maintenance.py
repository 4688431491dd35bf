"""Self-maintenance policy: read the layout report, decide, act.

The OPTIMIZE verb every lakehouse grows — here it is a pure composition:
``table_layout_report`` (O(files) manifest arithmetic) supplies the
health numbers, and the policy triggers ``compact_incremental`` (heal
small files; rewrites only the undersized subset) and/or a full
``compact`` (collapse key-overlap fragmentation; the only remedy once
merges have layered the key space). Decisions and actions are returned
for audit — a scheduler can run this after every N commits and a quiet,
healthy table costs one manifest read.
"""

from __future__ import annotations

from parquet_rewriter_spark.operators.compact import compact, compact_incremental
from parquet_rewriter_spark.operators.layout import table_layout_report
from parquet_rewriter_spark.table import SortedTable


def auto_optimize(
    table: SortedTable,
    target_rows: int,
    max_small_files: int = 4,
    max_overlap_depth: int = 4,
) -> dict:
    """Heal the table if — and only if — the layout report says so.

    Returns {action, before, after} where action ∈
    {"none", "compact_incremental", "compact_full"}.
    """
    before = table_layout_report(table, target_rows=target_rows).first().asDict()
    if before["max_key_overlap_depth"] > max_overlap_depth:
        # fragmentation: small-file healing can't fix overlap — full
        # re-chunk restores the one-file-per-key-range invariant
        compact(table, max_records_per_file=target_rows)
        action = "compact_full"
    elif before["n_small_files"] > max_small_files:
        compact_incremental(table, target_records_per_file=target_rows)
        action = "compact_incremental"
    else:
        return {"action": "none", "before": before, "after": before}
    after = table_layout_report(table, target_rows=target_rows).first().asDict()
    return {"action": action, "before": before, "after": after}
