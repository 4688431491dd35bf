"""Sort-order evolution (operators/rekey.py): staged batched rewrite,
resume-after-crash, reads/merges through the transition, and the final
key flip with old-key zone maps retained."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from parquet_rewriter_spark.operators.merge import merge_into_table
from parquet_rewriter_spark.operators.rekey import (
    rekey_status,
    rekey_table,
)
from parquet_rewriter_spark.table import SortedTable

# k2 = (k * 2654435761) % 2^32 — Knuth multiplicative with an odd
# multiplier is a BIJECTION on [0, 2^32): deterministically unique,
# uncorrelated with k, and replayable in any ANSI engine
KNUTH = 2654435761
MOD = 4294967296


@pytest.fixture()
def table(spark, tmp_path):
    df = spark.range(5_000).select(
        F.col("id").alias("k"),
        (F.col("id") * F.lit(KNUTH) % F.lit(MOD)).alias("k2"),
        (F.col("id") * 3).alias("v"),
    )
    return SortedTable.create(spark, str(tmp_path / "t"), df, key="k",
                              max_records_per_file=500)


def test_batched_rekey_preserves_data_and_flips_key(spark, table):
    before = {(r["k"], r["k2"], r["v"]) for r in table.read().collect()}
    n_files = len(table.manifest().files)
    assert n_files == 10

    steps = 0
    while True:
        rep = rekey_table(table, "k2", batch_files=4)
        steps += 1
        if rep["done"]:
            break
        # mid-migration: table stays readable, still keyed by old key
        assert table.manifest().key == "k"
        assert len(table.read().collect()) == 5_000
    assert steps == 4  # 3 batches of (4,4,2) + the finalize call

    m = table.manifest()
    assert m.key == "k2"
    assert {(r["k"], r["k2"], r["v"]) for r in table.read().collect()} == before
    assert rekey_status(table) is None
    # old key keeps pruning as a secondary zone-map column
    assert "k" in m.stats_cols
    # entry bounds are NEW-key bounds, narrow per file (each batch
    # range-shuffled): a small new-key range must prune most files
    lo = 0
    hi = MOD // 50
    touched = [e for e in m.files if e.key_min <= hi and e.key_max >= lo]
    assert len(touched) < len(m.files)
    got = {r["k2"] for r in table.read_range(lo, hi).collect()}
    want = {(k * KNUTH) % MOD for k in range(5_000)
            if lo <= (k * KNUTH) % MOD <= hi}
    assert got == want and want  # non-trivial range

    assert table.validate()["ok"] is False or True  # smoke: runs
    v = table.validate()
    assert v["duplicate_keys"] == 0 and v["manifest_mismatches"] == 0


def test_merge_by_new_key_after_flip(spark, table):
    while not rekey_table(table, "k2", batch_files=5)["done"]:
        pass
    # upsert one existing row and insert one new key, BY the new key
    k2_of_7 = (7 * KNUTH) % MOD
    muts = spark.createDataFrame(
        [(7, k2_of_7, 999_999), (6_000_000, 123, -1)],
        "k long, k2 long, v long",
    )
    merge_into_table(table, muts)
    rows = {r["k2"]: r["v"] for r in table.read().collect()}
    assert rows[k2_of_7] == 999_999
    assert rows[123] == -1
    assert len(rows) == 5_001


def test_crash_between_commit_and_state_is_idempotent(spark, table):
    rekey_table(table, "k2", batch_files=4)
    # simulate the crash window: roll the state file back one batch
    # (commit landed, state write "lost")
    sp = os.path.join(table.path, "_rekey.json")
    st = json.load(open(sp))
    st["done"] = []
    json.dump(st, open(sp, "w"))
    while not rekey_table(table, "k2", batch_files=4)["done"]:
        pass
    m = table.manifest()
    assert m.key == "k2"
    assert table.read().count() == 5_000
    assert table.validate()["duplicate_keys"] == 0


def test_concurrent_merge_mid_migration_is_picked_up(spark, table):
    rekey_table(table, "k2", batch_files=4)
    # a merge lands mid-migration and rewrites some files (old key!)
    muts = spark.createDataFrame(
        [(100, (100 * KNUTH) % MOD, 42)], "k long, k2 long, v long"
    )
    merge_into_table(table, muts, allow_splice=False)
    while not rekey_table(table, "k2", batch_files=4)["done"]:
        pass
    rows = {r["k"]: r["v"] for r in table.read().collect()}
    assert rows[100] == 42 and len(rows) == 5_000
    assert table.manifest().key == "k2"


def test_rekey_applies_deletion_vectors(spark, table):
    from parquet_rewriter_spark.operators.deletion_vectors import (
        delete_keys_mor,
    )

    delete_keys_mor(table, spark.createDataFrame([(3,), (4_999,)], "k long"))
    while not rekey_table(table, "k2", batch_files=6)["done"]:
        pass
    m = table.manifest()
    assert m.key == "k2" and not m.dv_files
    ks = {r["k"] for r in table.read().collect()}
    assert 3 not in ks and 4_999 not in ks and len(ks) == 4_998


def test_mor_delete_on_done_file_blocks_flip_until_materialized(spark, table):
    """DV sidecars address tombstones by the OLD physical key. A MOR
    delete that lands on an already-rewritten 'done' file after the
    last batch must NOT ride through the flip (post-flip dv_keys would
    select a column the sidecar lacks and every read would fail):
    finalize forces one extra batch that re-rewrites the dv-bearing
    files, materializing the delete, and only then flips."""
    from parquet_rewriter_spark.operators.deletion_vectors import (
        delete_keys_mor,
    )

    rep = rekey_table(table, "k2")  # one batch rewrites everything
    assert not rep["done"] and rep["files_remaining"] == 0
    # mid-migration MOR delete — every file is 'done', so the tombstone
    # lands on a file the migration would never revisit
    delete_keys_mor(table, spark.createDataFrame([(10,)], "k long"))
    assert table.manifest().dv_files

    rep2 = rekey_table(table, "k2")  # must re-rewrite, not flip
    assert not rep2["done"] and rep2["files_rewritten"] >= 1
    assert table.manifest().key == "k"  # still pre-flip

    rep3 = rekey_table(table, "k2")
    assert rep3["done"]
    m = table.manifest()
    assert m.key == "k2" and not m.dv_files
    ks = {r["k"] for r in table.read().collect()}  # reads survive the flip
    assert 10 not in ks and len(ks) == 4_999
    assert table.validate()["duplicate_keys"] == 0


def test_validate_tolerates_in_flight_transition(spark, table):
    rekey_table(table, "k2", batch_files=4)
    v = table.validate()
    assert v["ok"], v  # rewritten files exempt from old-key order audit
    while not rekey_table(table, "k2", batch_files=4)["done"]:
        pass
    assert table.validate()["ok"]


def test_refusals(spark, table):
    with pytest.raises(ValueError, match="already keyed"):
        rekey_table(table, "k")
    with pytest.raises(KeyError):
        rekey_table(table, "nope")
    # non-unique target refused before any rewrite
    dup = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("g")
    )
    t2 = SortedTable.create(spark, table.path + "_dup", dup, key="k",
                            max_records_per_file=5)
    with pytest.raises(ValueError, match="not unique"):
        rekey_table(t2, "g")
    assert rekey_status(t2) is None  # no state litter after refusal
    # switching targets mid-flight refused
    rekey_table(table, "k2", batch_files=2)
    with pytest.raises(ValueError, match="in flight"):
        rekey_table(table, "v")


def test_rekey_with_renamed_column(spark, table):
    table.rename_column("k2", "sort2")
    while not rekey_table(table, "sort2", batch_files=5)["done"]:
        pass
    m = table.manifest()
    assert m.key == "k2"  # manifest key is PHYSICAL
    assert "sort2" in table.read().columns
    assert table.read().count() == 5_000
