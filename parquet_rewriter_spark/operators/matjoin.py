"""Incrementally maintained JOIN view — denormalization at churn cost.

`operators/matview.py` maintains AGGREGATES from the change feed; this
maintains the other expensive derived shape: a denormalized INNER JOIN
``fact ⋈ dim`` (dim key unique), stored as its own SortedTable keyed by
the fact key. The classic incremental-view-maintenance decomposition
ΔV = ΔF⋈D ∪ F⋈ΔD, evaluated against the CURRENT snapshots so the two
passes can never disagree about a key:

* **fact pass** — `snapshot_diff(fact)` since the last refresh: deleted
  fact keys delete view rows; inserted/updated fact rows LEFT-join the
  current dim — matches upsert, non-matches delete (a fact UPDATE can
  move its foreign key off any dim row, which must EVICT the old view
  row, not leave it stale);
* **dim pass** — dim keys that changed since the last refresh select
  the AFFECTED facts (semi-join on the foreign key — with fk zone
  maps/Blooms on the fact table this prunes to touched files); those
  facts re-join the current dim: matches upsert, orphans (their dim row
  was deleted) delete.

Both passes land in ONE merge (mutations deduped by key — any
double-covered key gets an identical verdict from both passes, see
above), so refresh cost is churn(fact) + facts-referencing-churned-dims
— never |fact ⋈ dim|. Refresh state (last reconciled fact/dim versions,
the join spec) lives in a ``_matjoin.json`` sidecar at the view path;
re-running after a crash re-reads the same windows and the merge's
upserts/deletes are idempotent.

Reference tie: the same churn-proportional contract the reference's
dirty-block rewrite gives mutations (ParquetRewriter.java:253-301),
applied to keeping a denormalized projection fresh.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from parquet_rewriter_spark.operators.cdc import CHANGE_TYPE_COL, snapshot_diff
from parquet_rewriter_spark.operators.merge import (
    OP_COLUMN,
    OP_DELETE,
    OP_UPSERT,
    merge_into_table,
)
from parquet_rewriter_spark.table import SortedTable

STATE_NAME = "_matjoin.json"


def _state_path(view: SortedTable) -> str:
    return os.path.join(view.path, STATE_NAME)


def _write_state(view: SortedTable, state: dict[str, Any]) -> None:
    import uuid

    # ".tmp-" suffix so a crashed writer's leftover is fsck-collectable
    tmp = _state_path(view) + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(state, fh)
    os.replace(tmp, _state_path(view))


def _joined(fact_df: DataFrame, dim: SortedTable, fk: str) -> DataFrame:
    """fact ⋈ dim with the dim's key column dropped (it duplicates the
    foreign key); dim broadcasts — it is the small side by definition."""
    dkey = dim.manifest().key
    d = dim.read()
    dim_payload = [c for c in d.columns if c != dkey]
    return fact_df.join(
        F.broadcast(d), fact_df[fk] == d[dkey], "inner"
    ).select(*fact_df.columns, *dim_payload)


def create_join_view(
    spark: SparkSession,
    path: str,
    fact: SortedTable,
    dim: SortedTable,
    fk: str,
    max_records_per_file: int = 100_000,
) -> SortedTable:
    """Full build of the denormalized view + refresh-state sidecar."""
    fkey = fact.manifest().key
    view = SortedTable.create(
        spark,
        path,
        _joined(fact.read(), dim, fk),
        key=fkey,
        max_records_per_file=max_records_per_file,
    )
    _write_state(
        view,
        {
            "fk": fk,
            "fact_version": fact.manifest().version,
            "dim_version": dim.manifest().version,
        },
    )
    return view


def refresh_join_view(
    view: SortedTable, fact: SortedTable, dim: SortedTable
) -> dict[str, Any]:
    """Fold both tables' churn since the last refresh into the view with
    one merge. Returns the merge report plus the reconciled versions."""
    with open(_state_path(view)) as fh:
        state = json.load(fh)
    fk = state["fk"]
    fkey = fact.manifest().key
    vf1 = fact.manifest().version
    vd1 = dim.manifest().version

    muts: list[DataFrame] = []

    if vf1 > state["fact_version"]:
        delta = snapshot_diff(fact, state["fact_version"], vf1)
        dead = (
            delta.filter(F.col(CHANGE_TYPE_COL) == "delete")
            .select(fkey).distinct()
        )
        live = delta.filter(F.col(CHANGE_TYPE_COL) != "delete").drop(
            CHANGE_TYPE_COL
        )
        matched = _joined(live, dim, fk)
        # fact rows whose (possibly new) foreign key matches no dim row
        # must evict any previous view row for that key
        orphaned = live.join(
            matched.select(fkey), on=fkey, how="left_anti"
        ).select(fkey)
        muts.append(matched.withColumn(OP_COLUMN, F.lit(OP_UPSERT)))
        muts.append(_as_delete(view, dead.unionByName(orphaned)))

    if vd1 > state["dim_version"]:
        dkey = dim.manifest().key
        changed = (
            snapshot_diff(dim, state["dim_version"], vd1)
            .select(F.col(dkey).alias("__k")).distinct()
        )
        affected = _affected_facts(fact, fk, changed)
        matched = _joined(affected, dim, fk)
        orphaned = affected.join(
            matched.select(fkey), on=fkey, how="left_anti"
        ).select(fkey)
        muts.append(matched.withColumn(OP_COLUMN, F.lit(OP_UPSERT)))
        muts.append(_as_delete(view, orphaned))

    if not muts:
        return {"fact_version": vf1, "dim_version": vd1, "files_dirty": 0}

    all_muts = muts[0]
    for mdf in muts[1:]:
        all_muts = all_muts.unionByName(mdf, allowMissingColumns=True)
    # a key covered by both passes got the same verdict from each (both
    # evaluate against current snapshots) — keep one copy
    all_muts = all_muts.dropDuplicates([fkey])
    res = merge_into_table(view, all_muts)
    state.update({"fact_version": vf1, "dim_version": vd1})
    _write_state(view, state)
    res.update({"fact_version": vf1, "dim_version": vd1})
    return res


_MAX_INLINE_KEYS = 10_000


def _affected_facts(fact: SortedTable, fk: str, changed: DataFrame) -> DataFrame:
    """Fact rows referencing churned dim keys. The key set is bounded by
    the dim churn, so when it is small we collect it and turn the probe
    into (a) driver-side zone-map FILE pruning on the foreign key when
    the fact tracks ``stats_cols=[fk]`` — read_where drops
    non-overlapping files before Spark lists them — plus (b) an IN
    predicate pushed into the parquet scan. Huge dim churn (rare) falls
    back to one semi-join over the fact — still a single shuffle, never
    a crossJoin."""
    keys = [r["__k"] for r in changed.limit(_MAX_INLINE_KEYS + 1).collect()]
    if len(keys) > _MAX_INLINE_KEYS:
        fdf = fact.read()
        return fdf.join(changed, fdf[fk] == changed["__k"], "left_semi")
    if not keys:
        return fact.read().limit(0)
    m = fact.manifest()
    if fact.to_physical(fk, m) in m.stats_cols:
        fdf = fact.read_where({fk: (min(keys), max(keys))})
    else:
        fdf = fact.read()
    return fdf.filter(F.col(fk).isin(keys))


def _as_delete(view: SortedTable, keys: DataFrame) -> DataFrame:
    """Key-only deletes, padded (typed nulls) to the view schema so the
    merge union lines up column-for-column."""
    schema = view.read().schema
    fkey = view.manifest().key
    out = keys.select(F.col(fkey))
    for f in schema.fields:
        if f.name != fkey:
            out = out.withColumn(f.name, F.lit(None).cast(f.dataType))
    return out.withColumn(OP_COLUMN, F.lit(OP_DELETE))
