"""Per-file TOKEN-COUNT zone maps — the mixture planner's sidecar.

Reference scope note: the reference engine has no text operators; this
module is part of the beyond-reference training-data surface. The
mechanism is the engine's own per-file sidecar discipline
(operators/sidecar.py, like ``_driftstats/``) applied to token
accounting: every immutable data file carries one (file, source,
n_docs, n_tokens) row per source, maintained at CHURN cost — so a
mixture planner (temperature weights, token budgets, sampling rates)
answers "how many tokens does each source hold?" with a manifest-scale
fold over the sidecar, never a 100-TB corpus re-scan. This is the
Iceberg-count(*)-from-metadata idea extended to token totals: counts
the format does not keep, the engine's sidecar does.

Maintenance contract (shared with the drift/bloom/HLL sidecars):
``build_token_stats`` computes rows only for LIVE files missing one
under the spec — after a merge that is the churn, never the table —
and readers filter to the current snapshot's files via the
broadcast-semi-join helper, so the plan stays O(1) in file count.
Rows are additive integers, so folds are exact and order-free in any
engine.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from parquet_rewriter_spark.operators.bpe import words_expr
from parquet_rewriter_spark.operators.sidecar import (
    have_files,
    register_sidecar,
    semi_join_files,
)

TOKEN_DIR = register_sidecar("_tokenstats")


def _sidecar(table) -> str:
    return os.path.join(table.path, TOKEN_DIR)


def _spec_id(source_col: str, text_col: str, pretokenize: bool) -> str:
    return f"{source_col}|{text_col}|pt={int(bool(pretokenize))}"


def _build_for(
    table, names: list[str], pt: str, ps: str, pretokenize: bool, sid: str
) -> int:
    if not names:
        return 0
    spark = table.spark
    src = spark.read.parquet(
        *[os.path.join(table.path, n) for n in names]
    ).select(
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("file"),
        F.col(ps).alias("source"),
        F.size(words_expr(pt, pretokenize)).cast("long").alias("__tok"),
    )
    rows = (
        src.groupBy("file", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__tok").alias("n_tokens"),
        )
        .withColumn("spec", F.lit(sid))
    )
    rows.write.mode("append").parquet(_sidecar(table))
    return len(names)


def build_token_stats(
    table,
    text_col: str = "text",
    source_col: str = "source",
    pretokenize: bool = False,
) -> int:
    """(file, source, n_docs, n_tokens) rows for every LIVE file
    missing one under this spec. Returns the number of files built —
    after a merge this is the churn, never the table. ``pretokenize``
    selects the shared GPT-2-style word normalization
    (operators/bpe.py:words_expr) so the accounting matches whichever
    tokenizer front end the pipeline trains with."""
    m = table.manifest()
    pt = table.to_physical(text_col, m)
    ps = table.to_physical(source_col, m)
    sid = _spec_id(ps, pt, pretokenize)
    have = have_files(table, TOKEN_DIR, where=F.col("spec") == sid)
    todo = [e.name for e in m.files if e.name not in have]
    return _build_for(table, todo, pt, ps, pretokenize, sid)


def _parse_spec(sid: str) -> tuple[str, str, bool]:
    """Invert :func:`_spec_id` — the sidecar is SELF-DESCRIBING: every
    row carries its spec, so maintenance can heal all registered
    accountings without a manifest field (column names must not
    contain ``|``, same contract as the drift-spec JSON)."""
    body, pt = sid.rsplit("|pt=", 1)
    ps, pt_col = body.split("|", 1)
    return ps, pt_col, pt == "1"


def heal_token_stats(table) -> int:
    """Build (file, source, n_docs, n_tokens) rows for live files
    missing them under EVERY spec the sidecar already holds — the
    ``maintain()`` heal step (the distinct-sketch "whatever the
    sidecar holds" discipline): compactions, DV rewrites, and merges
    all stay accounted without explicit ``build_token_stats`` calls.
    Cost ∝ unaccounted files, zero when current. Returns files
    built."""
    side = _sidecar(table)
    if not os.path.isdir(side):
        return 0
    specs = [
        r["spec"]
        for r in table.spark.read.parquet(side)
        .select("spec").distinct().collect()
    ]
    m = table.manifest()
    live = [e.name for e in m.files]
    built = 0
    for sid in specs:
        ps, pt_col, pt = _parse_spec(sid)
        have = have_files(table, TOKEN_DIR, where=F.col("spec") == sid)
        todo = [n for n in live if n not in have]
        built += _build_for(table, todo, pt_col, ps, pt, sid)
    return built


def token_stats(
    table,
    text_col: str = "text",
    source_col: str = "source",
    pretokenize: bool = False,
) -> DataFrame:
    """(source, n_docs, n_tokens) for the CURRENT snapshot — a
    manifest-scale fold over the sidecar (live-file semi-join, one
    integer sum per source), zero corpus I/O. Exact: the per-file rows
    are integers, so the fold is order-free and equals the from-scratch
    scan bit-for-bit."""
    m = table.manifest()
    pt = table.to_physical(text_col, m)
    ps = table.to_physical(source_col, m)
    sid = _spec_id(ps, pt, pretokenize)
    sc = table.spark.read.parquet(_sidecar(table)).where(
        F.col("spec") == sid
    )
    live = semi_join_files(sc, [e.name for e in m.files])
    return live.groupBy("source").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )


def token_budget_plan(stats: DataFrame, budget_tokens: int) -> DataFrame:
    """Allocate a total token budget across sources proportionally to
    their token mass — the mixture planner's driver-side fold over the
    |sources|-row stats relation. INTEGER arithmetic throughout
    (``(budget · n_tokens) div total``): exact, order-free, and
    bit-replayable in any engine — no float pow/normalize whose last
    ulp could differ. Returns (source, n_docs, n_tokens,
    token_budget)."""
    B = int(budget_tokens)
    total = stats.agg(F.sum("n_tokens").alias("__total"))
    return (
        stats.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr(f"({B} * n_tokens) div __total").alias("token_budget"),
        )
    )


__all__ = [
    "TOKEN_DIR",
    "build_token_stats",
    "heal_token_stats",
    "token_stats",
    "token_budget_plan",
]
