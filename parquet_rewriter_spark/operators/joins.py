"""Join operators beyond Spark's built-in surface: as-of join, range join.

The reference has no joins at all — its one merge primitive is the
key-ordered cursor (ParquetBlockMutator.java:129-186), which Spark's
SortMergeJoin subsumes. These operators are north-star analytics surface
(SURVEY.md §2.2 "Joins" row): time-series as-of semantics and bounded
range self-joins, both expressed as compositions of built-in DataFrame
ops so Catalyst plans them (no Python in the hot path).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] | str = (),
    value_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``on`` <= left.``on`` within the same ``by`` group (inclusive match,
    like DuckDB/Pandas ``ASOF JOIN``/``merge_asof``).

    Spark-first plan: union both sides tagged, then one window pass with
    ``last(..., ignorenulls=True)`` over ``(by) ORDER BY (on, side)`` —
    a single shuffle on ``by``, no O(n·m) theta join, scales linearly.
    At equal ``on`` the right row sorts first (side 0) so it is visible
    to the left row, matching the inclusive >= contract.

    ``right`` must be unique per (by, on) — pre-aggregate if not, or the
    carried value is pick-of-equal-ties.
    """
    by = [by] if isinstance(by, str) else list(by)
    value_cols = list(value_cols if value_cols is not None else
                      [c for c in right.columns if c != on and c not in by])

    carried = [f"{c}{suffix}" for c in value_cols]
    r = right.select(
        *by,
        F.col(on).alias(on),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    ).withColumn(_SIDE, F.lit(0))
    l = left.withColumn(_SIDE, F.lit(1))
    for c in carried:
        l = l.withColumn(c, F.lit(None).cast(dict(r.dtypes)[c]))
    for c in left.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(l.dtypes)[c]))

    unioned = l.select(*left.columns, _SIDE, *carried).unionByName(
        r.select(*left.columns, _SIDE, *carried)
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned
    for c in carried:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.filter(F.col(_SIDE) == 1).drop(_SIDE)


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str] | str,
    on: str,
    lower: Column,
    upper: Column,
    left_alias: str = "l",
    right_alias: str = "r",
) -> DataFrame:
    """Equi-join on ``by`` plus a band predicate
    ``lower < right.on <= upper`` (bounds are expressions over the left
    alias). Catalyst plans the equi part as a hash/sort-merge join and
    evaluates the band as a post-filter — the scalable shape for
    "events within N minutes of each other per user".
    """
    by = [by] if isinstance(by, str) else list(by)
    l = left.alias(left_alias)
    r = right.alias(right_alias)
    cond = F.lit(True)
    for b in by:
        cond = cond & (F.col(f"{left_alias}.{b}") == F.col(f"{right_alias}.{b}"))
    cond = cond & (F.col(f"{right_alias}.{on}") > lower) & (F.col(f"{right_alias}.{on}") <= upper)
    return l.join(r, cond, "inner")
