"""Shared plumbing for per-file sidecar logs.

Four operators keep append-only parquet logs next to the table, one
row (or row group) per immutable data file: bloom filters
(operators/bloom.py), HLL distinct sketches
(operators/distinct_sketch.py), covariance triples
(operators/covstats.py), and drift count matrices
(operators/driftstats.py). They share two obligations this module
centralizes:

* **Live-file filtering without IN-lists.** A sidecar reader must keep
  only rows belonging to the current snapshot's files. Filtering with
  ``F.col("file").isin(<10^6 names>)`` embeds a multi-megabyte ``In``
  expression in the plan — analysis/codegen bogs down long before the
  data hurts (the same plan-explosion failure mode as literal-bearing
  merge plans). :func:`semi_join_files` instead builds a one-column
  DataFrame of names and broadcast left-semi-joins it: the plan stays
  O(1) in file count, the names travel as broadcast DATA.

* **Vacuum registration.** Every sidecar log keys rows by the ``file``
  column, so vacuum can sweep them all with one keep-filter rewrite —
  but only if it knows they exist. Each sidecar module registers its
  directory at import time via :func:`register_sidecar`; adding a new
  sidecar is that one line, and ``SortedTable.vacuum`` sweeps whatever
  is registered (a fifth sidecar can no longer be forgotten the way
  driftstats nearly was — it had to piggyback on a hook then named
  ``_vacuum_blooms``).

The per-file rows themselves stay manifest-scale by design (one small
row per file); it is only the *plan* representation of the live set
this module keeps bounded.
"""

from __future__ import annotations

import os
from typing import Iterable

from pyspark.sql import DataFrame, functions as F

# Directory names (relative to the table path) of every registered
# per-file sidecar log. Populated by register_sidecar() at module
# import; table.vacuum() sweeps exactly this list.
SIDECAR_DIRS: list[str] = []


def register_sidecar(dirname: str) -> str:
    """Register a per-file sidecar directory for the generic vacuum
    sweep and return the name (so modules can write
    ``X_DIR = register_sidecar("_x")``). Idempotent."""
    if dirname not in SIDECAR_DIRS:
        SIDECAR_DIRS.append(dirname)
    return dirname


# Below this many names an In-literal is the cheaper plan (Spark
# compiles >10-element lists to an O(1) InSet; a few hundred strings
# add negligible plan bytes). Above it the literal's analysis/codegen
# cost grows with the manifest — the names must travel as DATA.
IN_LIST_MAX = 256


def semi_join_files(
    df: DataFrame, names: Iterable[str], col: str = "file"
) -> DataFrame:
    """Keep rows of ``df`` whose ``col`` is one of ``names``. Small
    sets stay a plain ``isin`` (InSet — cheapest at toy manifests);
    past ``IN_LIST_MAX`` the filter becomes a broadcast LEFT-SEMI join
    against a single-column names relation, so the plan stays O(1) in
    live-file count instead of embedding a multi-MB ``In`` literal at
    large manifests. Names are sorted for a deterministic plan either
    way."""
    names = sorted(names)
    if len(names) <= IN_LIST_MAX:
        return df.filter(F.col(col).isin(names))
    spark = df.sparkSession
    from parquet_rewriter_spark.operators.util import local_df

    names_df = local_df(spark, [(n,) for n in names], f"{col} string")
    return df.join(F.broadcast(names_df), col, "left_semi")


def have_files(table, dirname: str, where=None, cols=("file",)) -> set:
    """Distinct ``cols`` values already present in the table's
    ``dirname`` sidecar (optionally under a ``where`` predicate) — the
    shared "which files are already covered?" probe every builder runs
    before building. Driver-side by design: the result is one entry
    per covered file, the same scale as the manifest the caller is
    about to diff it against. Returns a set of scalars for one column,
    tuples for several; empty when the sidecar doesn't exist yet."""
    side = os.path.join(table.path, dirname)
    if not os.path.isdir(side):
        return set()
    df = table.spark.read.parquet(side)
    if where is not None:
        df = df.filter(where)
    rows = df.select(*cols).distinct().collect()
    if len(cols) == 1:
        return {r[0] for r in rows}
    return {tuple(r) for r in rows}
