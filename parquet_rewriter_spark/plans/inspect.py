"""Physical-plan inspection — the 100 TB plan-quality story as a
library.

The reference hard-codes its four physical optimizations (SURVEY.md §4);
this engine gets them from Catalyst, which means plan quality can
silently regress (a filter stops pushing down, a dimension join stops
broadcasting) without any correctness test noticing. These helpers make
plan properties assertable: tests/test_plans.py pins them in CI, and
`plan_report` gives an operator-facing summary for ad-hoc inspection of
any query (`.explain` distilled to the properties that matter at scale).
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def plan_of(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string. ``formatted`` (default) is the
    node-per-paragraph layout with PushedFilters/ReadSchema detail;
    ``simple`` is the one-line-per-node tree carrying the
    ``*(N)`` whole-stage-codegen markers and inline Exchange arguments."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan. Every one is a full
    materialize-and-repartition of its input at scale — the first thing
    to check when a plan is slower than it should be."""
    return len(
        re.findall(
            r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)",
            plan_of(df, "simple"),
        )
    )


def has_broadcast_join(df: DataFrame) -> bool:
    """True if at least one join executes as a broadcast join (small
    side shipped to every executor — no shuffle of the big side)."""
    return "BroadcastHashJoin" in plan_of(df) or "BroadcastNestedLoopJoin" in plan_of(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """The predicates the Parquet scan will evaluate against row-group
    statistics (the read-side analog of the reference's zone-map skip,
    ParquetRewriter.java:263-283). Empty when nothing pushes down."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_of(df)):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schema(df: DataFrame) -> list[str]:
    """Column names each scan actually reads (column pruning check: a
    2-column projection reading 10 columns is a 5× IO regression)."""
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan_of(df)):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def plan_report(df: DataFrame) -> dict:
    """Plan-quality summary: the properties that decide whether a plan
    survives a 100× scale-up."""
    p = plan_of(df)
    simple = plan_of(df, "simple")
    return {
        "exchanges": count_exchanges(df),
        "broadcast_join": has_broadcast_join(df),
        "sort_merge_joins": p.count("SortMergeJoin"),
        "pushed_filters": pushed_filters(df),
        "read_schema": read_schema(df),
        # distinct *(N) codegen-stage ids — wide spans = more of the
        # plan fused into single JIT'd loops. NOTE: an un-executed AQE
        # plan (isFinalPlan=false) carries no codegen markers yet, so
        # this reads 0 until the query has run.
        "whole_stage_codegen_spans": len(set(re.findall(r"\*\((\d+)\)", simple))),
        "python_evals": len(re.findall(r"ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas|MapInPandas", p)),
        "take_ordered_topk": "TakeOrderedAndProject" in p,
    }
