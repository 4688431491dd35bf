"""Keyed table diff / reconciliation — classify every key as added,
removed, changed, or unchanged between two snapshots of a relation.

The data-engineering workhorse for validating a migration (old
pipeline vs new), auditing a merge, or computing a CDC delta between
arbitrary snapshots (the general form of ``operators/cdc.py``'s
manifest-aware ``table_changes``, for when the two sides are NOT
snapshots of the same SortedTable and no manifest can prune).

Shape: one full-outer shuffle join on the key. Value comparison is a
null-safe struct equality (codegen) — no hashing, no Python. At 100 TB
the join is the cost floor for arbitrary inputs; when both sides ARE
SortedTable snapshots, use ``table_changes`` instead — its manifest
diff skips unchanged files without reading them.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key: str,
    status_col: str = "diff_status",
) -> DataFrame:
    """(key, diff_status ∈ {added, removed, changed, unchanged}) —
    ``added`` = in right only, ``removed`` = in left only, ``changed``
    = key in both with any non-key column differing (null-safe: NULL vs
    NULL is equal, NULL vs value is a change)."""
    cols = [c for c in left.columns if c != key]
    if set(left.columns) != set(right.columns):
        raise ValueError(
            f"table_diff requires identical schemas; left-only "
            f"{set(left.columns) - set(right.columns)}, right-only "
            f"{set(right.columns) - set(left.columns)}"
        )
    l = left.alias("l")
    r = right.alias("r")
    joined = l.join(r, F.col(f"l.{key}") == F.col(f"r.{key}"), "full_outer")
    same = reduce(
        lambda a, b: a & b,
        [F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}")) for c in cols],
        F.lit(True),
    )
    status = (
        F.when(F.col(f"l.{key}").isNull(), F.lit("added"))
        .when(F.col(f"r.{key}").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.coalesce(F.col(f"l.{key}"), F.col(f"r.{key}")).alias(key),
        status.alias(status_col),
    )


def diff_summary(
    left: DataFrame, right: DataFrame, key: str
) -> DataFrame:
    """Count per diff status — the 4-row reconciliation report."""
    return (
        table_diff(left, right, key)
        .groupBy("diff_status")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )
