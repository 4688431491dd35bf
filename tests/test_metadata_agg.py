"""Metadata-only aggregates: exact answers from the manifest, no scan.

The operator's contract (operators/metadata_agg.py): rows always exact
(including under merge-on-read deletes), bounds exact only without DVs,
secondary zone-map answers only under full file coverage — and the
whole thing runs zero Spark jobs (pinned by poisoning the read paths).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_rewriter_spark.operators.merge import (
    OP_COLUMN,
    OP_UPSERT,
    delete_where,
    merge_into_table,
)
from parquet_rewriter_spark.operators.metadata_agg import metadata_aggregate
from parquet_rewriter_spark.sources.readers import load_table
from parquet_rewriter_spark.table import SortedTable


@pytest.fixture()
def orders_table(spark, tmp_path, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders, SortedTable.create(
        spark,
        str(tmp_path / "t"),
        orders,
        key="o_orderkey",
        max_records_per_file=200,
        stats_cols=["o_totalprice"],
    )


def _poison_reads(monkeypatch):
    """Any attempt to open table data during metadata_aggregate fails."""

    def boom(*a, **k):  # pragma: no cover - the assertion is that it never runs
        raise AssertionError("metadata_aggregate must not read data files")

    monkeypatch.setattr(SortedTable, "read", boom)
    monkeypatch.setattr(SortedTable, "read_physical", boom)


def test_exact_after_create_without_any_scan(orders_table, monkeypatch):
    orders, t = orders_table
    exp = orders.agg(
        F.count(F.lit(1)), F.min("o_orderkey"), F.max("o_orderkey"),
        F.min("o_totalprice"), F.max("o_totalprice"),
    ).first()

    _poison_reads(monkeypatch)
    agg = metadata_aggregate(t)

    assert agg["metadata_only"] and agg["rows_exact"] and agg["bounds_exact"]
    assert agg["rows"] == exp[0]
    assert agg["key"] == {"name": "o_orderkey", "min": exp[1], "max": exp[2]}
    assert agg["columns"]["o_totalprice"]["min"] == exp[3]
    assert agg["columns"]["o_totalprice"]["max"] == exp[4]


def test_exact_through_cow_mutations(orders_table):
    orders, t = orders_table
    delete_where(t, F.col("o_custkey") == 421)
    mut = (
        orders.filter(F.col("o_orderkey") % 97 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1)
        .withColumn(OP_COLUMN, F.lit(OP_UPSERT))
    )
    merge_into_table(t, mut)

    live = t.read()
    exp = live.agg(
        F.count(F.lit(1)), F.min("o_orderkey"), F.max("o_orderkey")
    ).first()
    agg = metadata_aggregate(t)
    assert agg["bounds_exact"] and agg["rows"] == exp[0]
    assert (agg["key"]["min"], agg["key"]["max"]) == (exp[1], exp[2])


def test_rows_exact_bounds_flagged_under_mor_deletes(orders_table):
    from parquet_rewriter_spark.operators.deletion_vectors import delete_where_mor

    _, t = orders_table
    delete_where_mor(t, F.col("o_orderstatus") == "F")

    agg = metadata_aggregate(t)
    assert agg["rows_exact"] and agg["rows"] == t.read().count()
    # a tombstone may hide a file's extreme row → bounds are conservative
    assert agg["bounds_exact"] is False


def test_partial_zone_map_coverage_yields_no_answer(spark, tmp_path, sf_dir):
    """A column added to stats_cols after some files were written has no
    zone map on the old files — the operator must refuse, not guess."""
    orders = load_table(spark, sf_dir, "orders")
    t = SortedTable.create(
        spark, str(tmp_path / "t2"), orders, key="o_orderkey",
        max_records_per_file=5000,
    )
    m = t.manifest()
    m.version += 1
    m.stats_cols = ["o_totalprice"]  # registered, but no file carries stats
    t._commit_manifest(m)
    assert "o_totalprice" not in metadata_aggregate(t)["columns"]


def test_key_reported_under_logical_name_after_rename(orders_table):
    _, t = orders_table
    t.rename_column("o_orderkey", "order_id")
    agg = metadata_aggregate(t)
    assert agg["key"]["name"] == "order_id"
