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
    direction: str = "backward",
    tolerance: Column | None = None,
    keep_match_col: bool = False,
) -> DataFrame:
    """For each left row, attach ONE right row within the same ``by``
    group, chosen by ``direction`` (like Pandas ``merge_asof``):

    - ``backward`` (default): greatest right ``on`` <= left ``on``;
    - ``forward``: smallest right ``on`` >= left ``on``;
    - ``nearest``: whichever of the two is closer in time (ties go
      backward, the merge_asof convention).

    ``tolerance`` (an interval Column, e.g. ``F.expr("INTERVAL 10
    MINUTES")``) null-outs matches farther than the bound — the carried
    columns stay NULL exactly as if no right row existed.
    ``keep_match_col=True`` keeps the matched right timestamp as
    ``{on}{suffix}``.

    Spark-first plan: union both sides tagged, then window passes with
    ``last``/``first(..., ignorenulls=True)`` over ``(by) ORDER BY (on,
    side)`` — a single shuffle on ``by`` (nearest runs two frame
    directions over the SAME partitioning, so still one exchange), no
    O(n·m) theta join. At equal ``on`` the right row is visible to the
    left row in both directions (inclusive match).

    ``right`` must be unique per (by, on) — pre-aggregate if not, or the
    carried value is pick-of-equal-ties.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction {direction!r}")
    by = [by] if isinstance(by, str) else list(by)
    value_cols = list(value_cols if value_cols is not None else
                      [c for c in right.columns if c != on and c not in by])

    # the matched right timestamp rides under an internal name (the
    # user-facing f"{on}{suffix}" would collide with left's own column
    # when suffix="") and is exposed/dropped at the end
    match_on = "__asof_match_on"
    value_cols = [c for c in value_cols if c != on]
    carried = [f"{c}{suffix}" for c in value_cols] + [match_on]
    r = right.select(
        *by,
        F.col(on).alias(on),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        F.col(on).alias(match_on),
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
    # backward frame: right rows (side 0) sort before the left row at
    # equal `on`, so the inclusive match is inside the preceding frame;
    # forward frame mirrors it (left first, following frame).
    w_back = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col(_SIDE).desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    out = unioned
    if direction in ("backward", "forward"):
        w = w_back if direction == "backward" else w_fwd
        pick = F.last if direction == "backward" else F.first
        for c in carried:
            out = out.withColumn(c, pick(c, ignorenulls=True).over(w))
        out = out.filter(F.col(_SIDE) == 1)
        if tolerance is not None:
            dt = (
                F.col(on) - F.col(match_on)
                if direction == "backward"
                else F.col(match_on) - F.col(on)
            )
            in_tol = F.col(match_on).isNotNull() & (dt <= tolerance)
            for c in carried:
                out = out.withColumn(c, F.when(in_tol, F.col(c)))
    else:  # nearest: both frames over one partitioning, pick the closer
        b_cols = [f"__b_{c}" for c in carried]
        f_cols = [f"__f_{c}" for c in carried]
        for c, bc, fc in zip(carried, b_cols, f_cols):
            out = out.withColumn(bc, F.last(c, ignorenulls=True).over(w_back))
            out = out.withColumn(fc, F.first(c, ignorenulls=True).over(w_fwd))
        out = out.filter(F.col(_SIDE) == 1)
        b_on, f_on = f"__b_{match_on}", f"__f_{match_on}"
        b_dt = F.col(on) - F.col(b_on)
        f_dt = F.col(f_on) - F.col(on)
        if tolerance is not None:
            b_ok = F.col(b_on).isNotNull() & (b_dt <= tolerance)
            f_ok = F.col(f_on).isNotNull() & (f_dt <= tolerance)
        else:
            b_ok = F.col(b_on).isNotNull()
            f_ok = F.col(f_on).isNotNull()
        use_b = b_ok & (~f_ok | (b_dt <= f_dt))  # tie → backward
        use_f = f_ok & ~use_b
        for c, bc, fc in zip(carried, b_cols, f_cols):
            out = out.withColumn(
                c,
                F.when(use_b, F.col(bc)).when(use_f, F.col(fc)),
            )
        out = out.drop(*b_cols, *f_cols)
    out = out.drop(_SIDE)
    if keep_match_col:
        public = f"{on}{suffix}"
        if public in out.columns and public != match_on:
            raise ValueError(
                f"keep_match_col would overwrite column {public!r}; use a suffix"
            )
        out = out.withColumnRenamed(match_on, public)
    else:
        out = out.drop(match_on)
    return out


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


def interval_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    by: Sequence[str] | str = (),
    bin_seconds: int = 3600,
    left_alias: str = "l",
    right_alias: str = "r",
) -> DataFrame:
    """Interval-OVERLAP join (genomics/sessions shape):
    ``l.start <= r.end AND r.start <= l.end`` (+ optional equi keys),
    WITHOUT the cross-join a bare inequality predicate would plan.

    Each interval explodes into the fixed-width time bins it covers
    (``sequence`` over epoch-bin ids — pure codegen); candidates meet
    only inside an equal (keys…, bin) bucket — one hash shuffle on the
    bucket, never all-pairs. A pair overlapping several shared bins
    would match repeatedly, so the join keeps exactly the bin that
    contains the OVERLAP START (``greatest(l.start, r.start)``) — a
    filter, not a distinct: no second shuffle for dedup.

    ``bin_seconds`` trades shuffle fan-out (intervals explode into
    ``duration/bin`` rows) against bucket selectivity; set it near the
    TYPICAL interval length. Correct for any interval/bin ratio.
    """
    by = [by] if isinstance(by, str) else list(by)
    w = F.lit(int(bin_seconds))

    def binned(df: DataFrame, start: str, end: str) -> DataFrame:
        lo = (F.unix_timestamp(F.col(start)) / w).cast("long")
        hi = (F.unix_timestamp(F.col(end)) / w).cast("long")
        return df.withColumn("__bin", F.explode(F.sequence(lo, hi)))

    l = binned(left, l_start, l_end).alias(left_alias)
    r = binned(right, r_start, r_end).alias(right_alias)
    lc = lambda c: F.col(f"{left_alias}.{c}")  # noqa: E731
    rc = lambda c: F.col(f"{right_alias}.{c}")  # noqa: E731
    cond = lc("__bin") == rc("__bin")
    for b in by:
        cond = cond & (lc(b) == rc(b))
    overlap_start = F.greatest(F.unix_timestamp(lc(l_start)), F.unix_timestamp(rc(r_start)))
    return (
        l.join(r, cond, "inner")
        .filter(
            (F.unix_timestamp(lc(l_start)) <= F.unix_timestamp(rc(r_end)))
            & (F.unix_timestamp(rc(r_start)) <= F.unix_timestamp(lc(l_end)))
            & ((overlap_start / w).cast("long") == lc("__bin"))
        )
        .drop("__bin")
    )
