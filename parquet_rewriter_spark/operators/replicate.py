"""Exactly-once table replication over the CDC feed.

A replica is a second SortedTable kept current by applying the
source's snapshot diffs as ordinary mutations — the generic form of
what the incremental matview (operators/matview.py) and search index
(operators/search_index.py) do for their specialized states:

- cost ∝ churn: ``snapshot_diff`` reads only files added/removed
  between the two source versions, and the replica merge zone-map-
  prunes to the touched keys' files — a quiet source costs nothing;
- exactly-once: each sync is a merge tagged ``(replica:<src>, src
  version)`` (table.py:Manifest.txns), so a re-run after a crash —
  or an over-eager scheduler double-firing — re-applies nothing;
  the replica's own manifest is the replication bookmark, there is
  no separate offsets store to drift out of sync;
- pull-based: the replica can live in another storage root (the
  cross-region / dev-mirror shape). Initial seed is a full snapshot
  copy stamped with the source version it saw.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from parquet_rewriter_spark.table import SortedTable


def _app_id(src: SortedTable) -> str:
    return f"replica:{os.path.abspath(src.path)}"


def replicate(src: SortedTable, dst_path: str) -> dict:
    """Create or catch up a replica of ``src`` at ``dst_path``.

    Returns sync metrics: src/dst versions, rows applied, and whether
    the call was a seed, an incremental catch-up, or a no-op replay.
    """
    spark = src.spark
    src_m = src.manifest()
    app = _app_id(src)

    manifest_path = os.path.join(dst_path, "_manifest.json")
    if not os.path.exists(manifest_path):
        # seed: full snapshot copy, bookmarked at the source version
        dst = SortedTable.create(
            spark,
            dst_path,
            src.read(),
            key=src_m.key,
            max_records_per_file=max((e.rows for e in src_m.files), default=1_000_000),
        )
        # stamp the bookmark with a zero-row txn-tagged merge: the seed
        # itself must not be re-applied by a concurrent re-run
        from parquet_rewriter_spark.operators.merge import merge_into_table

        empty = spark.createDataFrame([], src.read().schema).withColumn(
            "op", F.lit("UPSERT")
        )
        merge_into_table(dst, empty, txn=(app, src_m.version))
        # a zero-change merge doesn't commit; record the bookmark via a
        # metadata-only manifest flip instead
        m = dst.manifest()
        if m.txns.get(app) != src_m.version:
            from parquet_rewriter_spark.table import Manifest

            dst._commit_manifest(
                Manifest(
                    version=m.version + 1,
                    key=m.key,
                    files=m.files,
                    schema_json=m.schema_json,
                    stats_cols=m.stats_cols,
                    bloom_cols=m.bloom_cols,
                    dv_files=list(m.dv_files),
                    operation="replicate (seed bookmark)",
                    txns={**m.txns, app: src_m.version},
                )
            )
        return {
            "mode": "seed",
            "src_version": src_m.version,
            "rows": sum(e.rows for e in src_m.files),
        }

    dst = SortedTable(spark, dst_path)
    last = dst.manifest().txns.get(app)
    if last is None:
        raise ValueError(
            f"{dst_path} exists but carries no replication bookmark for "
            f"{app} — it is not a replica of this source"
        )
    if last >= src_m.version:
        return {"mode": "noop", "src_version": src_m.version, "rows": 0}

    from parquet_rewriter_spark.operators.cdc import snapshot_diff
    from parquet_rewriter_spark.operators.merge import OP_COLUMN, merge_into_table

    # physical names: the replica's OWN rename map (possibly divergent
    # or absent) governs its logical surface; data syncs on the stable
    # physical schema both tables share from the seed clone
    diff = snapshot_diff(src, last, src_m.version, logical_names=False)
    muts = diff.withColumn(
        OP_COLUMN,
        F.when(F.col("_change_type") == "delete", F.lit("DELETE")).otherwise(
            F.lit("UPSERT")
        ),
    ).drop("_change_type")
    res = merge_into_table(dst, muts, txn=(app, src_m.version))
    return {
        "mode": "noop" if res.get("skipped_txn_replay") else "incremental",
        "src_version": src_m.version,
        "rows": res.get("rows_rewritten", 0),
        "files_dirty": res.get("files_dirty", 0),
    }
