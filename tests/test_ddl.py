"""Metadata-only DDL: add/drop column, restore — no data files touched."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from parquet_rewriter_spark.operators.merge import merge_into_table
from parquet_rewriter_spark.sources.readers import load_table
from parquet_rewriter_spark.table import SortedTable


def _files(t):
    return sorted(f for f in os.listdir(t.path) if f.endswith(".parquet"))


def test_add_column_null_fills_without_rewrite(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders")
    t = SortedTable.create(spark, str(tmp_path / "t"), o, key="o_orderkey",
                           max_records_per_file=500)
    before = _files(t)
    v = t.add_column("o_score", "double")
    assert _files(t) == before  # metadata only
    df = t.read()
    assert "o_score" in df.columns
    assert df.filter(F.col("o_score").isNotNull()).count() == 0
    assert t.manifest().version == v


def test_add_column_then_merge_fills_values(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders")
    t = SortedTable.create(spark, str(tmp_path / "t"), o, key="o_orderkey",
                           max_records_per_file=500)
    t.add_column("o_score", "double")
    muts = o.filter(F.col("o_orderkey") % 5 == 0).withColumn(
        "o_score", F.col("o_totalprice") / 1000
    )
    merge_into_table(t, muts)
    got = t.read()
    assert got.filter((F.col("o_orderkey") % 5 == 0)
                      & F.col("o_score").isNull()).count() == 0
    assert got.filter((F.col("o_orderkey") % 5 != 0)
                      & F.col("o_score").isNotNull()).count() == 0


def test_drop_column_metadata_only_and_merge_sheds_it(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders")
    t = SortedTable.create(spark, str(tmp_path / "t"), o, key="o_orderkey",
                           max_records_per_file=500)
    before = _files(t)
    t.drop_column("o_orderpriority")
    assert _files(t) == before
    assert "o_orderpriority" not in t.read().columns
    # merges still work against the narrowed schema
    muts = t.read().filter(F.col("o_orderkey") % 9 == 0).withColumn(
        "o_totalprice", F.lit(0.0)
    )
    merge_into_table(t, muts)
    assert t.read().filter(F.col("o_totalprice") == 0.0).count() == \
        o.filter(F.col("o_orderkey") % 9 == 0).count()


def test_drop_key_or_missing_column_raises(spark, sf_dir, tmp_path):
    import pytest

    o = load_table(spark, sf_dir, "orders")
    t = SortedTable.create(spark, str(tmp_path / "t"), o, key="o_orderkey",
                           max_records_per_file=500)
    with pytest.raises(ValueError):
        t.drop_column("o_orderkey")
    with pytest.raises(ValueError):
        t.drop_column("nope")
    with pytest.raises(ValueError):
        t.add_column("o_custkey", "long")


def test_restore_rolls_back_as_new_commit(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders")
    t = SortedTable.create(spark, str(tmp_path / "t"), o, key="o_orderkey",
                           max_records_per_file=500)
    v0 = t.manifest().version
    total0 = t.read().agg(F.sum("o_totalprice")).first()[0]
    muts = o.limit(100).withColumn("o_totalprice", F.lit(0.0))
    merge_into_table(t, muts)
    assert t.read().agg(F.sum("o_totalprice")).first()[0] != total0
    v2 = t.restore(v0)
    assert t.manifest().version == v2
    assert t.read().agg(F.sum("o_totalprice")).first()[0] == total0
    # the undone version is still reachable (history intact)
    assert t.read(version=v2 - 1).filter(F.col("o_totalprice") == 0.0).count() == 100
