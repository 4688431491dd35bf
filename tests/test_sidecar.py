"""Shared sidecar plumbing (operators/sidecar.py): the broadcast
semi-join file filter that replaces O(live-file-count) IN-list
literals, and the registration list the generic vacuum sweep walks."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from parquet_rewriter_spark.operators.sidecar import (
    SIDECAR_DIRS,
    have_files,
    semi_join_files,
)
from parquet_rewriter_spark.plans import plan_of


def test_semi_join_files_is_broadcast_join_not_in_list(spark):
    """At 1k (or 10^6) live files the keep-filter must be a broadcast
    LEFT-SEMI JOIN — the names travel as broadcast DATA, the plan stays
    O(1) — never an In(file, [name0, ..., nameN]) literal whose
    analysis/codegen cost grows with the manifest."""
    df = spark.createDataFrame(
        [Row(file=f"part-{i:05d}.parquet", n=i) for i in range(50)]
    )
    names = [f"part-{i:05d}.parquet" for i in range(0, 2000, 2)]
    out = semi_join_files(df, names)
    p = plan_of(out)
    assert "BroadcastHashJoin" in p and "LeftSemi" in p, p
    # no giant literal membership predicate anywhere in the plan
    assert "part-00002.parquet, part-00004" not in p, p
    assert out.count() == 25  # files 0,2,...,48 present in df


def test_semi_join_files_filters_correctly(spark):
    df = spark.createDataFrame(
        [Row(file="a", v=1), Row(file="b", v=2), Row(file="c", v=3)]
    )
    kept = semi_join_files(df, {"b", "c", "zz"})
    assert {r["file"] for r in kept.collect()} == {"b", "c"}


def test_semi_join_files_small_sets_stay_in_list(spark):
    """Below IN_LIST_MAX the filter must stay a plain isin (InSet) —
    the cheapest plan at toy manifests; the broadcast join is the
    LARGE-manifest escape, not a tax on every 9-file table."""
    df = spark.createDataFrame([Row(file=f"f{i}", v=i) for i in range(20)])
    out = semi_join_files(df, [f"f{i}" for i in range(10)])
    p = plan_of(out)
    assert "Join" not in p, p
    assert out.count() == 10


def test_all_four_sidecars_registered():
    """Importing the sidecar modules must register their directories —
    the generic vacuum sweep covers exactly this list, so a missing
    registration means dead rows accrete forever."""
    import parquet_rewriter_spark.operators.bloom  # noqa: F401
    import parquet_rewriter_spark.operators.covstats  # noqa: F401
    import parquet_rewriter_spark.operators.distinct_sketch  # noqa: F401
    import parquet_rewriter_spark.operators.driftstats  # noqa: F401

    assert {"_blooms", "_distinct", "_covstats", "_driftstats"} <= set(
        SIDECAR_DIRS
    )


def test_have_files_single_and_multi_column(spark, tmp_path):
    import os

    class T:
        path = str(tmp_path)

    T.spark = spark
    side = os.path.join(str(tmp_path), "_x")
    spark.createDataFrame(
        [Row(file="f1", col="a"), Row(file="f1", col="a"),
         Row(file="f2", col="b")]
    ).write.parquet(side)
    assert have_files(T, "_x") == {"f1", "f2"}
    assert have_files(T, "_x", where=F.col("col") == "a") == {"f1"}
    assert have_files(T, "_x", cols=("file", "col")) == {
        ("f1", "a"), ("f2", "b")
    }
    assert have_files(T, "_nope") == set()
