"""Merge / upsert / delete — the reference's core semantics, Spark-first.

Reference semantics being reproduced (SURVEY.md §2.1 composite contract,
ParquetRewriterTests.java:215-244):
- upsert of an existing key REPLACES the record (ParquetRewriter.java:157-167
  + merge cursor ParquetBlockMutator.java:202-211);
- upsert of an absent key INSERTS at its sorted position, including
  before the first / after the last file (insertTest,
  ParquetRewriterTests.java:285-296);
- delete removes the record; delete of an absent key is a NO-OP
  (ParquetBlockMutator.java:184-185);
- untouched data passes through untouched (noChangesTest,
  ParquetRewriterTests.java:318-323) — here at file granularity: clean
  files are not rewritten, not even read;
- output stays key-sorted with no duplicate keys.

Architecture (NOT the reference's single-pass cursor — that design is
an artifact of single-threaded streaming; SURVEY.md §1.1 row 5):
- logical merge = union(mutations, base) + one window dedup, which
  Catalyst executes as a partial-agg-free single shuffle; mutations are
  order-free, so no ascending-key discipline is imposed
  (the reference throws on out-of-order keys, ParquetRewriter.java:256-258);
- physical pruning = zone-map dirty-file planning (the analog of
  seekToKey's stats pruning, ParquetRewriter.java:253-301): only files
  whose [key_min, key_max] contains a mutation key are read+rewritten.

Scale: mutation keys are mapped to files with a vectorized
``np.searchsorted`` over the (broadcast, sorted) file ranges — O(log F)
per key, no O(keys × files) nested-loop join. Mutation keys never
collect to the driver.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from parquet_rewriter_spark.table import Manifest, ManifestEntry, SortedTable

OP_COLUMN = "op"
OP_UPSERT = "UPSERT"
OP_DELETE = "DELETE"

_PRIORITY = "__src_priority"
_RN = "__rn"


def apply_mutations(base: DataFrame, mutations: DataFrame, key: str) -> DataFrame:
    """Logical merge: mutations win over base rows on key collision.

    ``mutations`` = base schema + an ``op`` column in {UPSERT, DELETE}.
    Pure DataFrame expression (union + window), so Catalyst plans one
    hash shuffle on ``key``; no Python in the hot path.
    """
    base_cols = base.columns
    mut = mutations
    if OP_COLUMN not in mut.columns:
        mut = mut.withColumn(OP_COLUMN, F.lit(OP_UPSERT))
    unioned = (
        mut.select(*base_cols, OP_COLUMN).withColumn(_PRIORITY, F.lit(0))
        .unionByName(base.withColumn(OP_COLUMN, F.lit(OP_UPSERT)).withColumn(_PRIORITY, F.lit(1)))
    )
    w = Window.partitionBy(key).orderBy(F.col(_PRIORITY))
    return (
        unioned.withColumn(_RN, F.row_number().over(w))
        .filter((F.col(_RN) == 1) & (F.col(OP_COLUMN) != OP_DELETE))
        .select(*base_cols)
    )


def upsert(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """R3: replace-or-insert by key (updates win)."""
    return apply_mutations(base, updates.withColumn(OP_COLUMN, F.lit(OP_UPSERT)), key)


def delete_keys(base: DataFrame, deletes: DataFrame, key: str) -> DataFrame:
    """R4/R11: drop rows whose key appears in ``deletes`` (anti-join).

    Absent keys are silently ignored — the reference's no-op delete
    (ParquetBlockMutator.java:184-185).
    """
    return base.join(deletes.select(key).distinct(), on=key, how="left_anti")


# ---------------- dirty-file planning (zone-map pruning) ----------------


def plan_dirty_files(
    spark: SparkSession,
    manifest: Manifest,
    mutations: DataFrame,
) -> tuple[list[ManifestEntry], list[ManifestEntry]]:
    """Split manifest files into (dirty, clean) against the mutation key set.

    A file is dirty iff some mutation key k satisfies
    ``key_min <= k <= key_max`` — exactly the reference's seek decision
    (ParquetRewriter.java:263-283), lifted from row-group to file.

    Files' ranges are sorted by key_min; a vectorized searchsorted
    assigns each distinct mutation key its candidate file(s); ranges may
    overlap after gap-inserting merges, so we probe the (rare) overlap
    window conservatively.
    """
    key = manifest.key
    entries = sorted(manifest.files, key=lambda e: (e.key_min, e.key_max))
    if not entries:
        return [], []

    mins = [e.key_min for e in entries]
    maxs = [e.key_max for e in entries]

    import numpy as np

    mins_arr = np.asarray(mins)
    maxs_arr = np.asarray(maxs)
    # With overlapping ranges, a key can fall in any file whose min <= k
    # at index <= searchsorted(mins, k); bound the backward probe by the
    # max overlap depth so the common (disjoint) case stays O(1) per key.
    depth = 1
    running_max = maxs_arr[0]
    for i in range(1, len(entries)):
        d = 1
        while i - d >= 0 and maxs_arr[i - d] >= mins_arr[i]:
            d += 1
        depth = max(depth, d)
        running_max = max(running_max, maxs_arr[i])

    def find_dirty(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out = set()
        for pdf in batches:
            ks = pdf["k"].to_numpy()
            pos = np.searchsorted(mins_arr, ks, side="right") - 1
            for back in range(depth):
                idx = pos - back
                ok = (idx >= 0) & (ks >= np.take(mins_arr, np.clip(idx, 0, None))) & (
                    ks <= np.take(maxs_arr, np.clip(idx, 0, None))
                )
                out.update(np.unique(idx[ok]).tolist())
        yield pd.DataFrame({"file_idx": sorted(int(i) for i in out)})

    # No pre-distinct on keys (that would be a full shuffle of the
    # mutation set just to dedupe searchsorted probes) and no
    # post-distinct on file indices (each partition already emits a
    # unique set; the driver-side set comprehension dedupes the rest) —
    # the whole plan is one shuffle-free mapInPandas pass.
    keys_df = mutations.select(F.col(key).alias("k"))
    dirty_idx = {
        int(r.file_idx)
        for r in keys_df.mapInPandas(find_dirty, schema="file_idx long").collect()
    }
    dirty = [e for i, e in enumerate(entries) if i in dirty_idx]
    clean = [e for i, e in enumerate(entries) if i not in dirty_idx]
    return dirty, clean


def merge_into_table(
    table: SortedTable,
    mutations: DataFrame,
    max_records_per_file: int | None = None,
) -> dict:
    """R3+R4+R5+R6+R13: merge a mutation stream into a SortedTable.

    Plan: zone-map split files into dirty/clean → read ONLY dirty files
    → union+window merge with mutations → sorted write of new files →
    manifest flip keeping clean entries verbatim (file-granularity raw
    passthrough: clean bytes are never read, the analog of
    ``writer.appendRowGroup(raw)`` at ParquetRewriter.java:317).

    Returns merge metrics (the reference exposes nanosecond phase
    counters, ParquetRewriter.java:349-359; we expose file/row counts).
    """
    import os

    spark = table.spark
    m = table.manifest()
    key = m.key
    dirty, clean = plan_dirty_files(spark, m, mutations)

    if dirty:
        base_dirty = spark.read.parquet(*[os.path.join(table.path, e.name) for e in dirty])
        merged = apply_mutations(base_dirty, mutations, key)
    else:
        # Pure-insert merge (all keys fall in gaps / head / tail).
        mut = mutations
        if OP_COLUMN not in mut.columns:
            mut = mut.withColumn(OP_COLUMN, F.lit(OP_UPSERT))
        base_cols = [c for c in mut.columns if c != OP_COLUMN]
        merged = mut.filter(F.col(OP_COLUMN) != OP_DELETE).select(*base_cols)

    mrpf = max_records_per_file or max((e.rows for e in m.files), default=1_000_000)
    # No isEmpty() pre-check (an extra Spark action): an empty merge
    # writes an empty staging dir and _adopt_staged drops zero-row
    # files, so the empty case costs nothing extra on the common path.
    staging = table._write_sorted(merged, key, mrpf)
    new_entries = table._adopt_staged(staging, key)
    n_new_rows = sum(e.rows for e in new_entries)

    files = sorted(clean + new_entries, key=lambda e: (e.key_min, e.name))
    table._commit_manifest(
        Manifest(
            version=m.version + 1,
            key=key,
            files=files,
            schema_json=m.schema_json or merged.schema.json(),
        )
    )
    return {
        "version": m.version + 1,
        "files_total": len(m.files),
        "files_dirty": len(dirty),
        "files_clean_passthrough": len(clean),
        "files_written": len(new_entries),
        "rows_rewritten": n_new_rows,
    }
