"""Metadata-only RENAME COLUMN (Delta-style column mapping): files keep
physical names forever; the manifest maps physical -> logical; readers
project the rename and writers translate mutations back.

Reference parity: the reference has no rename (schema is fixed at
construction, ParquetRewriter.java:115-129); this is part of the
schema-evolution surface real pipelines need (SURVEY.md §2.2)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from parquet_rewriter_spark.operators.merge import delete_where, merge_into_table
from parquet_rewriter_spark.table import SortedTable


def _mk(spark, tmp_path, n=1000, mrpf=200):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 2.0).alias("v"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
    )
    return SortedTable.create(spark, str(tmp_path / "t"), df, key="k",
                              max_records_per_file=mrpf)


def test_rename_is_metadata_only_and_reads_logical(spark, tmp_path):
    t = _mk(spark, tmp_path)
    files_before = sorted(e.name for e in t.manifest().files)
    v = t.rename_column("v", "value")
    assert v == t.manifest().version
    # no file was touched
    assert sorted(e.name for e in t.manifest().files) == files_before
    df = t.read()
    assert df.columns == ["k", "value", "s"]
    assert df.agg(F.sum("value")).first()[0] == sum(i * 2.0 for i in range(1000))
    # time travel BEFORE the rename still shows the old name
    assert t.read(version=v - 1).columns == ["k", "v", "s"]


def test_merge_after_rename_uses_logical_names(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("v", "value")
    muts = spark.createDataFrame([(5, -1.0, "x5"), (2000, -2.0, "new")],
                                 "k long, value double, s string")
    res = merge_into_table(t, muts, allow_splice=False)
    assert res["files_written"] >= 1
    got = {r["k"]: r["value"] for r in t.read().filter("k in (5, 2000)").collect()}
    assert got == {5: -1.0, 2000: -2.0}
    # rename mapping survives the merge commit
    assert t.manifest().rename_map == {"v": "value"}
    # physical files still carry the physical name
    import pyarrow.parquet as pq
    for e in t.manifest().files:
        assert "v" in pq.ParquetFile(os.path.join(t.path, e.name)).schema_arrow.names


def test_splice_after_rename(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("v", "value")
    muts = spark.createDataFrame([(5, -1.0, "x5")], "k long, value double, s string")
    res = merge_into_table(t, muts)
    assert res["path"] == "rowgroup_splice", res
    assert t.read().filter("k = 5").first()["value"] == -1.0


def test_rename_key_column(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("k", "pk")
    assert t.read().columns == ["pk", "v", "s"]
    muts = spark.createDataFrame([(7, -1.0, "x")], "pk long, v double, s string")
    merge_into_table(t, muts, allow_splice=False)
    assert t.read().filter("pk = 7").first()["v"] == -1.0
    # delete_where works against the logical key name
    delete_where(t, "pk = 7")
    assert t.read().filter("pk = 7").count() == 0


def test_rename_collisions_refused(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError):
        t.rename_column("v", "s")      # logical collision
    with pytest.raises(KeyError):
        t.rename_column("nope", "x")   # unknown column
    t.rename_column("v", "value")
    with pytest.raises(ValueError):
        t.add_column("value", "double")  # logical clash with renamed col
    with pytest.raises(ValueError):
        t.add_column("v", "double")      # physical clash with in-file bytes


def test_rename_then_rename_back_and_chain(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("v", "value")
    t.rename_column("value", "v")  # back: mapping collapses to identity
    assert t.manifest().rename_map == {}
    assert t.read().columns == ["k", "v", "s"]
    # chain onto a freed name: v->c then s->v
    t.rename_column("v", "c")
    t.rename_column("s", "v")
    assert t.read().columns == ["k", "c", "v"]
    assert t.read().filter("k = 3").first()["v"] == "s3"


def test_drop_renamed_column(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("v", "value")
    t.drop_column("value")
    assert t.read().columns == ["k", "s"]
    assert t.manifest().rename_map == {}


def test_compact_preserves_rename(spark, tmp_path):
    from parquet_rewriter_spark.operators.compact import compact

    t = _mk(spark, tmp_path)
    t.rename_column("v", "value")
    compact(t, max_records_per_file=500)
    assert t.read().columns == ["k", "value", "s"]
    assert t.manifest().rename_map == {"v": "value"}
    assert t.read().agg(F.sum("value")).first()[0] == sum(i * 2.0 for i in range(1000))


def test_read_where_and_stats_on_renamed_column(spark, tmp_path):
    df = (
        spark.range(1000)
        .select(F.col("id").alias("k"), (F.col("id") % 50).alias("grp"))
    )
    t = SortedTable.create(spark, str(tmp_path / "t"), df, key="k",
                           max_records_per_file=200, stats_cols=["grp"])
    t.rename_column("grp", "bucket")
    out = t.read_where({"bucket": (10, 12)})
    assert out.columns == ["k", "bucket"]
    assert out.count() == df.filter("id % 50 between 10 and 12").count()


def test_mor_delete_after_rename(spark, tmp_path):
    from parquet_rewriter_spark.operators.deletion_vectors import delete_where_mor

    t = _mk(spark, tmp_path)
    t.rename_column("v", "value")
    res = delete_where_mor(t, "value < 10.0")
    assert res.get("files_rewritten", 0) == 0  # MoR: tombstones only
    assert t.read().filter("value < 10.0").count() == 0
    assert t.read().count() == 1000 - 5  # ids 0..4 have v<10


def test_snapshot_diff_and_batch_changelog_surface_logical_names(spark, tmp_path):
    """Direct CDC consumers of a renamed table see the CURRENT logical
    names (matching table.read/stream_changes); changelog FILES keep the
    stable physical names underneath."""
    from parquet_rewriter_spark.operators.cdc import (
        CHANGELOG_DIR,
        read_changelog,
        snapshot_diff,
    )

    t = _mk(spark, tmp_path)
    t.rename_column("v", "value")
    v_before = t.manifest().version
    muts = spark.createDataFrame([(3, -9.0, "x3")], "k long, value double, s string")
    merge_into_table(t, muts, changelog=True, allow_splice=False)

    feed = snapshot_diff(t, v_before)
    assert "value" in feed.columns and "v" not in feed.columns
    post = feed.filter("k = 3 AND _change_type = 'update_postimage'").first()
    assert post["value"] == -9.0
    # physical escape hatch for plumbing that manages its own mapping
    assert "v" in snapshot_diff(t, v_before, logical_names=False).columns

    batch = read_changelog(t, from_commit=v_before + 1)
    assert "value" in batch.columns and "v" not in batch.columns
    vals = {r["value"] for r in batch.filter("k = 3").collect()}
    assert vals == {-9.0, 6.0}  # postimage + preimage under the new name
    # storage stays physical: the raw changelog parquet carries "v"
    raw = spark.read.parquet(os.path.join(t.path, CHANGELOG_DIR))
    assert "v" in raw.columns and "value" not in raw.columns


def test_batch_changelog_commit_bounds(spark, tmp_path):
    from parquet_rewriter_spark.operators.cdc import read_changelog

    t = _mk(spark, tmp_path)
    for i, (k, val) in enumerate([(1, -1.0), (2, -2.0)]):
        muts = spark.createDataFrame([(k, val, f"x{k}")],
                                     "k long, v double, s string")
        merge_into_table(t, muts, changelog=True, allow_splice=False)
    versions = sorted(
        r["_commit_version"]
        for r in read_changelog(t).select("_commit_version").distinct().collect()
    )
    assert len(versions) == 2
    only_first = read_changelog(t, to_commit=versions[0])
    assert {r["k"] for r in only_first.collect()} == {1}
    only_last = read_changelog(t, from_commit=versions[1])
    assert {r["k"] for r in only_last.collect()} == {2}


def test_changelog_stream_surfaces_logical_names(spark, tmp_path):
    """Changelog FILES keep stable physical names across renames (like
    Delta CDF under column mapping); the stream_changes consumer maps
    them to the CURRENT logical names."""
    import uuid

    from pyspark.sql import functions as F

    from parquet_rewriter_spark.operators.cdc import stream_changes
    from parquet_rewriter_spark.operators.merge import merge_into_table

    t = _mk(spark, tmp_path)
    t.rename_column("v", "value")
    muts = spark.createDataFrame([(3, -9.0, "x3")], "k long, value double, s string")
    merge_into_table(t, muts, changelog=True, allow_splice=False)

    name = f"mem_rename_cdc_{uuid.uuid4().hex[:8]}"
    q = (
        stream_changes(t)
        .writeStream.format("memory").queryName(name)
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(120)
    got = spark.table(name)
    assert "value" in got.columns and "v" not in got.columns
    vals = {r["value"] for r in got.filter("k = 3").collect()}
    assert -9.0 in vals  # post-image carries the new value under the new name
    assert 6.0 in vals   # preimage (k=3 had v = 3*2.0) rides along
