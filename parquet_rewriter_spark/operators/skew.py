"""Skew mitigation — salting utilities for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew by splitting oversized shuffle partitions. These explicit rewrites
cover the cases AQE cannot: a single hot key whose *build* side must be
replicated (salted join), and count(DISTINCT) over groups whose value
sets dwarf a task (distinct-first rewrite).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

_SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join resilient to hot keys on the (large) left side.

    Left rows get a uniform random salt in [0, salt); right rows are
    replicated once per salt value; the join key becomes
    (on..., salt) — a hot left key now spreads over ``salt`` shuffle
    partitions instead of one straggler task. Cost: right side
    shuffle volume × salt — use for large-left × modest-right joins
    where the right side is still too big to broadcast.
    """
    if how.replace("_", "").lower() in {"right", "rightouter", "full", "fullouter", "outer"}:
        # unmatched RIGHT rows exist once per salt replica — the rewrite
        # is only sound when right-side rows need a match to survive
        raise ValueError(f"salted_join does not support how={how!r} (right rows are replicated)")
    on = [on] if isinstance(on, str) else list(on)
    l = left.withColumn(_SALT, (F.rand(seed=7) * salt).cast("int"))
    r = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l.join(r, on=on + [_SALT], how=how).drop(_SALT)


def hot_keys(df: DataFrame, key: str, min_count: int) -> list:
    """Keys with more than ``min_count`` rows — ONE aggregation with
    map-side partial combine; the collect is bounded by rows/min_count
    (the number of genuinely hot keys), not the key domain."""
    return [
        r[key]
        for r in df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > min_count)
        .select(key)
        .collect()
    ]


def hot_cold_split_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    hot: list | None = None,
    hot_min_count: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where hot-key rows go through a BROADCAST join (a hot
    key never shuffles at all) and the rest through the regular shuffle
    join; the halves union to exactly the plain join's rows.

    This is AQE's skew-join idea lifted to an explicit operator: AQE
    only splits oversized SORT-MERGE partitions at runtime; the split
    join also covers known-up-front skew, lets the hot half skip the
    shuffle entirely, and composes with any downstream plan. ``hot``
    gives the hot keys explicitly; otherwise they are detected with
    ``hot_keys(big, key, hot_min_count)``. Empty hot set degenerates to
    the plain join. Unlike ``salted_join``, every join type is sound —
    the key space is partitioned disjointly, nothing is replicated.
    """
    key = on if isinstance(on, str) else list(on)[0]
    on = [on] if isinstance(on, str) else list(on)
    if hot is None:
        if hot_min_count is None:
            raise ValueError("pass either hot= or hot_min_count=")
        hot = hot_keys(big, key, hot_min_count)
    if not hot:
        return big.join(small, on=on, how=how)
    is_hot = F.col(key).isin(hot)
    # null keys must go COLD: isin(null) is null and ~null is null, so a
    # bare ~is_hot filter would silently drop them — they still emit in
    # outer joins
    cold = F.coalesce(~is_hot, F.lit(True))
    hot_half = big.filter(is_hot).join(F.broadcast(small.filter(is_hot)), on=on, how=how)
    cold_half = big.filter(cold).join(small.filter(cold), on=on, how=how)
    return hot_half.unionByName(cold_half)


def skew_safe_count_distinct(
    df: DataFrame,
    group_cols: str | Sequence[str],
    distinct_col: str,
    alias: str = "n_distinct",
) -> DataFrame:
    """count(DISTINCT x) per group without a per-group distinct set.

    Rewrite: dedup on (group, x) — cardinality spreads over all
    (group, x) pairs, not per-group — then a plain count. Two light
    shuffles instead of one skewed one. NULLs in ``distinct_col`` are
    excluded, matching SQL ``count(DISTINCT x)`` (a bare count(1) after
    the distinct would count the null row).
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    return (
        df.select(*group_cols, distinct_col)
        .filter(F.col(distinct_col).isNotNull())
        .distinct()
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias(alias))
    )
