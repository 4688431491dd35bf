"""Symlink-manifest export: a consistent snapshot for external engines,
refusing representations that would be silently wrong (DVs, renames)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_rewriter_spark.operators.interop import (
    read_symlink_manifest,
    write_symlink_manifest,
)
from parquet_rewriter_spark.operators.merge import delete_where
from parquet_rewriter_spark.sources.readers import load_table
from parquet_rewriter_spark.table import SortedTable


@pytest.fixture()
def table(spark, tmp_path, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return SortedTable.create(
        spark, str(tmp_path / "t"), orders, key="o_orderkey",
        max_records_per_file=500,
    )


def test_export_reads_back_identically(spark, table):
    delete_where(table, F.col("o_custkey") % 5 == 0)  # CoW — exportable
    info = write_symlink_manifest(table)
    ext = read_symlink_manifest(spark, table.path)
    assert info["rows"] == ext.count() == table.read().count()
    a = ext.agg(F.round(F.sum("o_totalprice"), 2)).first()[0]
    b = table.read().agg(F.round(F.sum("o_totalprice"), 2)).first()[0]
    assert a == b


def test_export_pins_a_version_not_the_head(spark, table):
    v0 = table.manifest().version
    info0 = write_symlink_manifest(table, version=v0)
    before = read_symlink_manifest(spark, table.path).count()
    delete_where(table, F.col("o_custkey") % 2 == 0)
    # manifest still lists the OLD snapshot until re-exported
    assert read_symlink_manifest(spark, table.path).count() == before
    info1 = write_symlink_manifest(table)
    assert info1["version"] > info0["version"]
    assert read_symlink_manifest(spark, table.path).count() == table.read().count()


def test_refuses_dv_and_renamed_snapshots(spark, table):
    from parquet_rewriter_spark.operators.deletion_vectors import delete_where_mor

    table.rename_column("o_custkey", "customer_id")
    with pytest.raises(ValueError, match="renamed"):
        write_symlink_manifest(table)
    table.rename_column("customer_id", "o_custkey")  # back to identity
    # a round-trip rename must normalize to the EMPTY map (rename_column
    # pops the physical entry and skips identity re-adds), restoring
    # exportability — a non-identity residue here is a regression
    assert not table.manifest().rename_map
    delete_where_mor(table, F.col("o_orderstatus") == "F")
    with pytest.raises(ValueError, match="deletion vectors"):
        write_symlink_manifest(table)
