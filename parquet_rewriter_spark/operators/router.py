"""Scan routing: pick the cheapest pruning structure for a predicate.

The table carries several independent skipping structures — the key
zone map (manifest ranges, R2/R5), secondary zone maps (``stats_cols``),
and Bloom sidecars for unclustered equality — each exposed as its own
read method (``read_range`` / ``read_where`` / ``bloom.read_point``).
A query-facing engine shouldn't make the caller pick: this router
inspects a conjunctive predicate and dispatches,

1. range/equality bounds on the key or a stats column → ONE
   ``read_where`` covering all of them (file survives only if every
   bound overlaps its zone maps);
2. equality/IN on a bloom-indexed, zone-map-less column → bloom
   candidate pruning (``read_point``), with any remaining bounds as
   residual filters;
3. anything else → full snapshot scan with the predicate pushed to
   parquet (row-group stats still skip inside files).

Every path applies the EXACT residual predicate after pruning, so the
choice is purely a cost decision — wrong routing can never return
wrong rows. The returned report (strategy + files scanned vs total)
is the explain surface; at a million-file manifest the difference
between branches is the difference between listing 3 files and 10⁶.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame, functions as F

from parquet_rewriter_spark.table import SortedTable


def smart_read(
    table: SortedTable,
    ranges: dict[str, tuple[Any, Any]] | None = None,
    equals: dict[str, Sequence[Any]] | None = None,
) -> tuple[DataFrame, dict]:
    """Route a conjunction of range bounds (``col → (lo, hi)``,
    inclusive, either side None) and equality/IN predicates
    (``col → values``) to the cheapest skipping structure.

    Returns ``(df, report)``; the DataFrame already carries the exact
    residual predicate."""
    from parquet_rewriter_spark.operators.bloom import candidate_files, read_point

    ranges = dict(ranges or {})
    equals = {c: list(v) for c, v in (equals or {}).items()}
    m = table.manifest()
    zone_cols = {m.key, *m.stats_cols}
    n_total = len(m.files)

    # single-value equality on a zone-mapped column is a degenerate range
    for c in list(equals):
        if c in zone_cols and len(equals[c]) == 1:
            ranges[c] = (equals[c][0], equals[c][0])
            del equals[c]

    zone_ranges = {c: b for c, b in ranges.items() if c in zone_cols}
    residual_ranges = {c: b for c, b in ranges.items() if c not in zone_cols}

    def residual(df: DataFrame) -> DataFrame:
        for c, (lo, hi) in residual_ranges.items():
            if lo is not None:
                df = df.filter(F.col(c) >= lo)
            if hi is not None:
                df = df.filter(F.col(c) <= hi)
        for c, vals in equals.items():
            df = df.filter(F.col(c).isin(vals))
        return df

    if zone_ranges:
        df = residual(table.read_where(zone_ranges))
        kept = [
            e for e in m.files
            if table.zone_keep(m, e, zone_ranges)
        ]
        return df, {
            "strategy": "zone_maps",
            "pruned_on": sorted(zone_ranges),
            "files_scanned": len(kept),
            "files_total": n_total,
        }

    for c, vals in equals.items():
        cand = candidate_files(table, c, vals)
        if cand is not None:
            rest = {k: v for k, v in equals.items() if k != c}
            df = read_point(table, c, vals)
            for rc, rvals in rest.items():
                df = df.filter(F.col(rc).isin(rvals))
            for rc, (lo, hi) in residual_ranges.items():
                if lo is not None:
                    df = df.filter(F.col(rc) >= lo)
                if hi is not None:
                    df = df.filter(F.col(rc) <= hi)
            return df, {
                "strategy": "bloom",
                "pruned_on": [c],
                "files_scanned": len(cand),
                "files_total": n_total,
            }

    return residual(table.read()), {
        "strategy": "full_scan",
        "pruned_on": [],
        "files_scanned": n_total,
        "files_total": n_total,
    }


