"""Incremental JOIN view: churn-proportional refresh must land exactly
where a full rebuild would, through fact churn, dim churn, fk moves,
and dim deletes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_rewriter_spark.operators.matjoin import (
    create_join_view,
    refresh_join_view,
)
from parquet_rewriter_spark.operators.merge import (
    delete_keys,
    delete_where,
    merge_into_table,
    update_where,
)
from parquet_rewriter_spark.sources.readers import load_table
from parquet_rewriter_spark.table import SortedTable


@pytest.fixture()
def tables(spark, tmp_path, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    fact = SortedTable.create(
        spark, str(tmp_path / "fact"), orders, key="o_orderkey",
        max_records_per_file=500,
    )
    dim = SortedTable.create(
        spark, str(tmp_path / "dim"), cust, key="c_custkey",
        max_records_per_file=500,
    )
    view = create_join_view(
        spark, str(tmp_path / "view"), fact, dim, fk="o_custkey",
        max_records_per_file=200,
    )
    return fact, dim, view


def _expected(fact, dim):
    f, d = fact.read(), dim.read()
    return (
        f.join(d, f["o_custkey"] == d["c_custkey"])
        .agg(
            F.count(F.lit(1)),
            F.round(F.sum("o_totalprice"), 2),
            F.round(F.sum("c_acctbal"), 2),
        )
        .first()
    )


def _actual(view):
    return view.read().agg(
        F.count(F.lit(1)),
        F.round(F.sum("o_totalprice"), 2),
        F.round(F.sum("c_acctbal"), 2),
    ).first()


def test_initial_build_matches_plain_join(tables):
    fact, dim, view = tables
    assert tuple(_actual(view)) == tuple(_expected(fact, dim))


def test_fact_churn_refresh(tables, spark):
    fact, dim, view = tables
    update_where(fact, F.col("o_orderkey") < 100,
                 {"o_totalprice": F.col("o_totalprice") + 5})
    delete_where(fact, F.col("o_orderkey").between(100, 120))
    res = refresh_join_view(view, fact, dim)
    assert res["files_dirty"] < res["files_total"]
    assert tuple(_actual(view)) == tuple(_expected(fact, dim))


def test_dim_churn_and_dim_delete_refresh(tables, spark):
    fact, dim, view = tables
    update_where(dim, F.col("c_custkey") == 7, {"c_acctbal": F.lit(9999.0)})
    delete_where(dim, F.col("c_custkey") == 11)  # its orders must evict
    refresh_join_view(view, fact, dim)
    assert tuple(_actual(view)) == tuple(_expected(fact, dim))
    assert view.read().filter(F.col("o_custkey") == 11).count() == 0


def test_both_sides_churn_one_refresh(tables, spark):
    fact, dim, view = tables
    update_where(fact, F.col("o_orderkey") < 100,
                 {"o_totalprice": F.col("o_totalprice") * 2})
    update_where(dim, F.col("c_custkey") < 5, {"c_acctbal": F.lit(1.0)})
    delete_where(dim, F.col("c_custkey") == 20)
    refresh_join_view(view, fact, dim)
    assert tuple(_actual(view)) == tuple(_expected(fact, dim))
    # idempotent: nothing new → no-op refresh
    res = refresh_join_view(view, fact, dim)
    assert res["files_dirty"] == 0
    assert tuple(_actual(view)) == tuple(_expected(fact, dim))


def test_dim_pass_with_fk_zone_maps(spark, tmp_path, sf_dir):
    """With stats_cols=[fk] on the fact, the dim pass goes through the
    zone-map pruned read path and still lands exactly."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    fact = SortedTable.create(
        spark, str(tmp_path / "fz"), orders, key="o_orderkey",
        max_records_per_file=500, stats_cols=["o_custkey"],
    )
    dim = SortedTable.create(
        spark, str(tmp_path / "dz"), cust, key="c_custkey",
        max_records_per_file=500,
    )
    view = create_join_view(
        spark, str(tmp_path / "vz"), fact, dim, fk="o_custkey",
        max_records_per_file=200,
    )
    update_where(dim, F.col("c_custkey") == 3, {"c_acctbal": F.lit(777.0)})
    delete_where(dim, F.col("c_custkey") == 9)
    refresh_join_view(view, fact, dim)
    assert tuple(_actual(view)) == tuple(_expected(fact, dim))
    assert view.read().filter(F.col("o_custkey") == 9).count() == 0
