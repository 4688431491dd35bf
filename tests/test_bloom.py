"""Per-file Bloom filters: point-lookup file skipping, no false
negatives, maintenance through merge/compaction/vacuum."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from parquet_rewriter_spark.operators.bloom import (
    BLOOM_DIR,
    candidate_files,
    read_point,
)
from parquet_rewriter_spark.operators.merge import OP_COLUMN, merge_into_table
from parquet_rewriter_spark.table import SortedTable


@pytest.fixture()
def table(spark, tmp_path):
    """id-keyed table; ``tag`` is high-cardinality and UNCLUSTERED
    (hash-scrambled), so zone maps cannot prune it but blooms can."""
    df = spark.range(0, 20_000).select(
        F.col("id"),
        F.concat(F.lit("u"), (F.xxhash64("id") % 100_000).cast("string")).alias("tag"),
        (F.col("id") * 1.0).alias("val"),
    )
    return SortedTable.create(
        spark,
        str(tmp_path / "bl"),
        df,
        key="id",
        max_records_per_file=2_000,
        bloom_cols=["tag"],
    )


def _tag_of(table, id_):
    return table.read().filter(F.col("id") == id_).first()["tag"]


def test_sidecar_written_and_prunes(table):
    assert os.path.isdir(os.path.join(table.path, BLOOM_DIR))
    m = table.manifest()
    assert m.bloom_cols == ["tag"] and len(m.files) == 10

    tag = _tag_of(table, 4_321)
    cand = candidate_files(table, "tag", [tag])
    # the value lives in exactly one file; FP rate ~1% → expect very few candidates
    assert 1 <= len(cand) <= 3
    df = read_point(table, "tag", [tag])
    rows = df.collect()
    assert [r["id"] for r in rows] == [4_321]
    assert len(df.inputFiles()) == len(cand) < 10


def test_absent_value_prunes_everything(table):
    cand = candidate_files(table, "tag", ["no-such-tag-xyz"])
    assert len(cand) <= 1  # at most an FP file
    assert read_point(table, "tag", ["no-such-tag-xyz"]).count() == 0


def test_multi_value_in_lookup(table):
    tags = [_tag_of(table, i) for i in (10, 9_999, 19_000)]
    got = {r["id"] for r in read_point(table, "tag", tags).collect()}
    assert got == {10, 9_999, 19_000}


def test_untracked_column_falls_back(table):
    assert candidate_files(table, "val", [5.0]) is None
    assert read_point(table, "val", [5.0]).count() == 1


def test_merge_maintains_blooms(spark, table):
    tag = _tag_of(table, 7_777)
    # move the row's tag to a brand-new value via upsert (distributed path)
    muts = (
        table.read()
        .filter(F.col("id").between(7_000, 7_999))
        .withColumn(
            "tag", F.when(F.col("id") == 7_777, F.lit("fresh-tag")).otherwise(F.col("tag"))
        )
        .withColumn(OP_COLUMN, F.lit("UPSERT"))
    )
    res = merge_into_table(table, muts, allow_splice=False)
    assert res["files_dirty"] == 1
    got = read_point(table, "tag", ["fresh-tag"]).collect()
    assert [r["id"] for r in got] == [7_777]
    # the old tag may still FP into its former file, but the row is gone
    assert read_point(table, "tag", [tag]).count() == 0


def test_splice_path_maintains_blooms(spark, table):
    muts = spark.createDataFrame(
        [(3_333, "spliced-tag", 1.0)], "id long, tag string, val double"
    )
    res = merge_into_table(table, muts)
    assert res["path"] == "rowgroup_splice"
    got = read_point(table, "tag", ["spliced-tag"]).collect()
    assert [r["id"] for r in got] == [3_333]
    assert len(read_point(table, "tag", ["spliced-tag"]).inputFiles()) <= 3


def test_no_false_negatives_bulk(table):
    """Every one of 200 sampled values must be found via the bloom path.
    (Compares TAGS, not ids — tag = hash % 100k collides across ids, and
    a tag-equality probe rightly returns every id sharing the tag.)"""
    sample = table.read().filter(F.col("id") % 100 == 0).select("id", "tag").collect()
    tags = {r["tag"] for r in sample}
    rows = read_point(table, "tag", list(tags)).collect()
    assert {r["id"] for r in rows} >= {r["id"] for r in sample}  # nothing missed
    assert {r["tag"] for r in rows} == tags  # and only probed tags returned


def test_vacuum_rewrites_sidecar(spark, table):
    muts = (
        table.read()
        .filter(F.col("id").between(0, 999))
        .withColumn("val", F.col("val") + 1)
        .withColumn(OP_COLUMN, F.lit("UPSERT"))
    )
    merge_into_table(table, muts, allow_splice=False)
    live = {e.name for e in table.manifest().files}
    side = os.path.join(table.path, BLOOM_DIR)
    files_in_sidecar = {
        r.file for r in spark.read.parquet(side).select("file").collect()
    }
    assert files_in_sidecar - live  # stale rows exist pre-vacuum
    table.vacuum(retain_versions=1)
    files_in_sidecar = {
        r.file for r in spark.read.parquet(side).select("file").collect()
    }
    assert files_in_sidecar <= live  # stale rows gone
    tag = _tag_of(table, 123)
    assert read_point(table, "tag", [tag]).count() == 1
