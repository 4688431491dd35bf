"""CDC-driven replication: replica == source after every sync, syncs
are exactly-once (re-runs no-op), and catch-up cost is churn-bounded."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_rewriter_spark.operators.merge import delete_where, merge_into_table
from parquet_rewriter_spark.operators.replicate import replicate
from parquet_rewriter_spark.sources.readers import load_table
from parquet_rewriter_spark.table import SortedTable


@pytest.fixture()
def src(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    return SortedTable.create(
        spark, str(tmp_path / "src"), orders, key="o_orderkey", max_records_per_file=500
    )


def _equal(a, b) -> bool:
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def _mutate(spark, src, key, cust):
    base = src.read()
    row = base.filter(F.col("o_orderkey") == 0).drop("o_orderkey").first()
    mut = spark.createDataFrame([(key, cust) + tuple(row)[1:]], base.schema)
    merge_into_table(src, mut.withColumn("op", F.lit("UPSERT")))


def test_seed_then_incremental_then_replay(spark, src, tmp_path):
    dst_path = str(tmp_path / "dst")
    r1 = replicate(src, dst_path)
    assert r1["mode"] == "seed"
    dst = SortedTable(spark, dst_path)
    assert _equal(src.read(), dst.read())

    # churn the source: two upserts and a predicate delete
    _mutate(spark, src, -1, 111)
    _mutate(spark, src, 5, 999)
    delete_where(src, F.col("o_orderkey").between(10, 20))

    r2 = replicate(src, dst_path)
    assert r2["mode"] == "incremental"
    assert _equal(src.read(), dst.read())
    # churn-bounded: the catch-up merge touched a few files, not all
    assert r2["files_dirty"] < len(dst.manifest().files)

    # replay (double-fire): must be a no-op, replica still exact
    r3 = replicate(src, dst_path)
    assert r3["mode"] == "noop" and r3["rows"] == 0
    assert _equal(src.read(), dst.read())


def test_quiet_source_costs_nothing(spark, src, tmp_path):
    dst_path = str(tmp_path / "dst2")
    replicate(src, dst_path)
    v = SortedTable(spark, dst_path).manifest().version
    r = replicate(src, dst_path)
    assert r["mode"] == "noop"
    assert SortedTable(spark, dst_path).manifest().version == v


def test_foreign_table_refused(spark, src, sf_dir, tmp_path):
    other = SortedTable.create(
        spark,
        str(tmp_path / "other"),
        load_table(spark, sf_dir, "orders"),
        key="o_orderkey",
        max_records_per_file=500,
    )
    with pytest.raises(ValueError, match="not a replica"):
        replicate(src, str(tmp_path / "other"))
