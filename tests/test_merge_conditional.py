"""Conditional MERGE (WHEN-clause semantics) — operators/merge_conditional.py.
Ground truth is computed with plain set algebra over the same inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_rewriter_spark.operators.merge_conditional import (
    conditional_merge,
    merge_conditional_into_table,
)
from parquet_rewriter_spark.sources.readers import load_table
from parquet_rewriter_spark.table import SortedTable


@pytest.fixture(scope="module")
def people(spark):
    rows = [(i, f"name{i}", i * 10.0, "old") for i in range(20)]
    return spark.createDataFrame(rows, "id long, name string, score double, tag string")


@pytest.fixture(scope="module")
def updates(spark):
    # ids 10..29: 10..19 collide with base, 20..29 are new
    rows = [(i, f"NEW{i}", i * 100.0, "new") for i in range(10, 30)]
    return spark.createDataFrame(rows, "id long, name string, score double, tag string")


def test_matched_update_with_condition(spark, people, updates):
    # only even matched ids update; odd matched ids keep target values
    out = conditional_merge(
        people,
        updates,
        "id",
        matched=[("s.id % 2 = 0", "update", {"score": "s.score", "tag": F.lit("upd")})],
    ).collect()
    by_id = {r.id: r for r in out}
    assert set(by_id) == set(range(20))  # no inserts requested
    assert by_id[10].score == 1000.0 and by_id[10].tag == "upd"
    assert by_id[10].name == "name10"  # unmentioned column keeps target value
    assert by_id[11].score == 110.0 and by_id[11].tag == "old"
    assert by_id[4].score == 40.0  # untouched row


def test_clause_order_first_match_wins(spark, people, updates):
    out = conditional_merge(
        people,
        updates,
        "id",
        matched=[
            ("s.id = 12", "delete", None),
            (None, "update", {"tag": F.lit("u")}),
        ],
    ).collect()
    ids = {r.id for r in out}
    assert 12 not in ids
    tags = {r.id: r.tag for r in out}
    assert tags[10] == "u" and tags[15] == "u"
    assert tags[3] == "old"


def test_not_matched_insert_with_condition(spark, people, updates):
    out = conditional_merge(
        people,
        updates,
        "id",
        not_matched=[("s.score > 2500", None)],
    ).collect()
    ids = {r.id for r in out}
    # inserts: source-only ids 20..29 with score>2500 → 26..29
    assert ids == set(range(20)) | {26, 27, 28, 29}
    ins = {r.id: r for r in out if r.id >= 20}
    assert ins[27].name == "NEW27" and ins[27].score == 2700.0


def test_insert_with_assignment_map(spark, people, updates):
    out = conditional_merge(
        people,
        updates,
        "id",
        not_matched=[(None, {"id": "s.id", "name": F.upper("s.name"), "score": F.lit(0.0)})],
    ).collect()
    ins = {r.id: r for r in out if r.id >= 20}
    assert len(ins) == 10
    assert ins[21].name == "NEW21" and ins[21].score == 0.0
    assert ins[21].tag is None  # unmentioned insert column → NULL


def test_not_matched_by_source_clauses(spark, people, updates):
    out = conditional_merge(
        people,
        updates,
        "id",
        matched=[(None, "update", {"tag": F.lit("seen")})],
        not_matched_by_source=[
            ("t.id < 3", "delete", None),
            (None, "update", {"tag": F.lit("stale")}),
        ],
    ).collect()
    by_id = {r.id: r for r in out}
    assert set(by_id) == set(range(3, 20))
    assert by_id[5].tag == "stale" and by_id[12].tag == "seen"


def test_table_level_merge_prunes_clean_files(spark, tmp_path, sf_dir):
    orders = load_table(spark, sf_dir, "orders").limit(1000)
    t = SortedTable.create(
        spark, str(tmp_path / "cm"), orders, key="o_orderkey", max_records_per_file=200
    )
    m0 = t.manifest()
    lo_keys = orders.filter(F.col("o_orderkey") < 50)
    src = lo_keys.withColumn("o_totalprice", F.col("o_totalprice") + 1.0)

    res = merge_conditional_into_table(
        t,
        src,
        matched=[("s.o_totalprice > t.o_totalprice", "update", {"o_totalprice": "s.o_totalprice"})],
        not_matched=[(None, None)],
    )
    assert res["files_clean_passthrough"] >= len(m0.files) - 2
    got = t.read().filter(F.col("o_orderkey") < 50).select("o_orderkey", "o_totalprice")
    want = {
        r["o_orderkey"]: r["o_totalprice"] + 1.0
        for r in lo_keys.select("o_orderkey", "o_totalprice").collect()
    }
    for r in got.collect():
        assert abs(r["o_totalprice"] - want[r["o_orderkey"]]) < 1e-6
    # untouched rows unchanged
    n_all = t.read().count()
    assert n_all == 1000


def test_table_level_equivalent_to_dataframe_level(spark, tmp_path, sf_dir):
    orders = load_table(spark, sf_dir, "orders").limit(500)
    t = SortedTable.create(
        spark, str(tmp_path / "cm2"), orders, key="o_orderkey", max_records_per_file=100
    )
    src = (
        orders.filter(F.col("o_orderkey") % 5 == 0)
        .withColumn("o_orderstatus", F.lit("X"))
    )
    clauses = dict(
        matched=[
            ("t.o_orderstatus = 'F'", "delete", None),
            (None, "update", {"o_orderstatus": "s.o_orderstatus"}),
        ],
        not_matched=[(None, None)],
    )
    expect = conditional_merge(orders, src, "o_orderkey", **clauses)
    merge_conditional_into_table(t, src, **clauses)
    got = t.read()
    assert got.count() == expect.count()
    assert (
        got.exceptAll(expect).count() == 0 and expect.exceptAll(got).count() == 0
    )
