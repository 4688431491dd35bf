"""Data-quality constraints — declarative expectations over a relation.

The ingestion side of a training-data pipeline needs cheap, continuous
validation (null keys, range violations, referential orphans) BEFORE
bad rows poison a corpus. Rules here are plain SQL predicates, so the
whole check compiles to ONE aggregation pass over the scan — a
`sum(CASE WHEN NOT pred ...)` per rule inside a single partial+final
hash aggregate, no per-rule jobs, no Python in the row path. 100 TB
cost = one table scan regardless of rule count.

Two consumption modes:
- ``check_constraints`` → per-rule violation counts (monitoring);
- ``enforce_constraints`` → (clean, violations) split for quarantine
  pipelines; violations carry the names of every rule they break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _preds(rules: dict[str, str]) -> dict[str, "F.Column"]:
    if not rules:
        raise ValueError("at least one rule required")
    return {name: F.expr(sql) for name, sql in rules.items()}


def check_constraints(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """One row per rule: (rule, n_violations, n_rows, pass_rate).

    A NULL predicate result counts as a violation (unknown is not
    passing) — matched via ``NOT coalesce(pred, false)``.
    """
    preds = _preds(rules)
    agg = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(
                F.when(~F.coalesce(p, F.lit(False)), F.lit(1)).otherwise(F.lit(0))
            ).alias(f"__v_{name}")
            for name, p in preds.items()
        ],
    )
    stack_args = ", ".join(f"'{name}', __v_{name}" for name in preds)
    return agg.select(
        F.expr(
            f"stack({len(preds)}, {stack_args}) AS (rule, n_violations)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "rule",
        F.col("n_violations").cast("long").alias("n_violations"),
        "n_rows",
        F.round(1.0 - F.col("n_violations") / F.col("n_rows"), 6).alias("pass_rate"),
    )


def enforce_constraints(
    df: DataFrame, rules: dict[str, str]
) -> tuple[DataFrame, DataFrame]:
    """Split into (clean, violations); violations gain a
    ``_violated_rules`` array naming every failed rule. Both sides are
    filters over the same scan — Catalyst shares the plan, and the
    violation side is what a quarantine sink writes."""
    preds = _preds(rules)
    flags = F.array(
        *[
            F.when(~F.coalesce(p, F.lit(False)), F.lit(name))
            for name, p in preds.items()
        ]
    )
    tagged = df.withColumn("_violated_rules", F.filter(flags, lambda x: x.isNotNull()))
    clean = tagged.filter(F.size("_violated_rules") == 0).drop("_violated_rules")
    violations = tagged.filter(F.size("_violated_rules") > 0)
    return clean, violations
