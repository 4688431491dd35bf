"""Batch sessionization — the gap-based event→session rollup every
clickstream / training-data pipeline needs (the batch twin of
``streaming/ops.py``'s session windows and stateful sessionizer).

Shape: one shuffle on the user column; the gap detection, session
numbering, and per-session aggregation all ride the same partitioning
(lag → running sum → groupBy(user, session) reuses the exchange), so
the whole operator is a single hash exchange + codegen'd windows.
Per-user skew is the only scale caveat: a bot user with 10^8 events
serializes through one task — cap per-user history upstream or bucket
by (user, day) first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: float = 30.0,
    session_col: str = "session_idx",
) -> DataFrame:
    """Assign a per-user session index: a new session starts at the
    first event and whenever the gap since the user's previous event
    exceeds ``gap_minutes``. Adds ``session_col`` (0-based within each
    user)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_s = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
    new_sess = F.when(
        gap_s.isNull() | (gap_s > F.lit(int(gap_minutes * 60) * 1_000_000)), 1
    ).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1,
    )


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Per-session rollup: (user, session_idx, n_events, started_at,
    duration_s). groupBy(user, session) reuses the sessionize
    exchange — no second shuffle."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("started_at"),
        (
            (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))) / 1e6
        ).alias("duration_s"),
    )
