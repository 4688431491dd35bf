"""Distinct-count zone maps: per-file HLL sketches, union-at-query.
Covers estimate accuracy, file-range pruning, incremental refresh
after a merge, and rename-mapping translation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_rewriter_spark.operators.distinct_sketch import (
    approx_distinct_range,
    build_distinct_sketches,
    distinct_sketch_report,
)
from parquet_rewriter_spark.operators.merge import merge_into_table
from parquet_rewriter_spark.table import SortedTable


@pytest.fixture()
def table(spark, tmp_path):
    # dense key 0..9999; user = k % 700 → 700 distinct overall
    df = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 700).alias("user")
    )
    t = SortedTable.create(spark, str(tmp_path / "t"), df, key="k",
                           max_records_per_file=1_000)
    return t


def test_estimate_within_tolerance_and_scan_free_pruning(spark, table):
    n = build_distinct_sketches(table, ["user"])
    assert n == len(table.manifest().files) > 1
    est = approx_distinct_range(table, "user")
    assert abs(est - 700) <= 0.05 * 700
    # pruned range: estimate grain is the FILE subset overlapping the
    # range — compare against the exact distinct over those same files
    rep = {r.label: r for r in distinct_sketch_report(
        table, "user", [("head", 0, 499), ("all", None, None)]
    ).collect()}
    assert rep["head"].files_used < rep["head"].files_total
    import os
    m = table.manifest()
    kept = [os.path.join(table.path, e.name) for e in m.files
            if e.key_min <= 499]
    exact_head = (
        spark.read.parquet(*kept).select("user").distinct().count()
    )
    assert abs(rep["head"].n_approx - exact_head) <= max(2, 0.05 * exact_head)
    assert abs(rep["all"].n_approx - 700) <= 0.05 * 700


def test_incremental_refresh_after_merge(spark, table):
    build_distinct_sketches(table, ["user"])
    # dirty one file's range only
    muts = spark.range(100).select(
        F.col("id").alias("k"), F.lit(9999).alias("user")
    )
    merge_into_table(table, muts, allow_splice=False)
    n2 = build_distinct_sketches(table, ["user"])
    assert 1 <= n2 < len(table.manifest().files)  # only rewritten files
    est = approx_distinct_range(table, "user")
    # users now: 700 originals minus none (only keys 0..99 overwritten,
    # their old users 0..99 still appear at higher keys) plus 9999
    assert abs(est - 701) <= 0.05 * 701


def test_enable_then_merge_auto_refreshes(spark, table):
    from parquet_rewriter_spark.operators.distinct_sketch import (
        enable_distinct_sketches,
    )

    n = enable_distinct_sketches(table, ["user"])
    assert n == len(table.manifest().files)
    assert table.manifest().sketch_cols == ["user"]
    muts = spark.range(50).select(
        F.col("id").alias("k"), F.lit(10_001).alias("user")
    )
    merge_into_table(table, muts, allow_splice=False)
    # the merge hook already sketched the rewritten files — an explicit
    # refresh finds nothing to do, and the estimate is current
    assert build_distinct_sketches(table, ["user"]) == 0
    est = approx_distinct_range(table, "user")
    assert abs(est - 701) <= max(2, 0.05 * 701)


def test_registration_survives_compact_and_read_self_heals(spark, table):
    from parquet_rewriter_spark.operators.compact import compact
    from parquet_rewriter_spark.operators.distinct_sketch import (
        enable_distinct_sketches,
    )

    enable_distinct_sketches(table, ["user"])
    compact(table, max_records_per_file=5_000)
    # compact has no sketch hook; registration must inherit through its
    # commit, and the read must sketch the compacted files on demand
    # rather than silently undercounting
    assert table.manifest().sketch_cols == ["user"]
    est = approx_distinct_range(table, "user")
    assert abs(est - 700) <= max(2, 0.05 * 700)
    assert build_distinct_sketches(table, ["user"]) == 0  # healed


def test_splice_merge_keeps_sketch_rows(spark, table):
    from parquet_rewriter_spark.operators.distinct_sketch import (
        enable_distinct_sketches,
    )

    enable_distinct_sketches(table, ["user"])
    muts = spark.createDataFrame([(3, 10_001)], "k long, user long")
    merge_into_table(table, muts)  # splice fast path when eligible
    assert build_distinct_sketches(table, ["user"]) == 0


def test_sketches_respect_rename_mapping(spark, table):
    build_distinct_sketches(table, ["user"])
    table.rename_column("user", "uid")
    est = approx_distinct_range(table, "uid")
    assert abs(est - 700) <= 0.05 * 700
    # a refresh via the NEW name is a no-op (sidecar keyed physically)
    assert build_distinct_sketches(table, ["uid"]) == 0


def test_refuses_dv_bearing_files_like_covstats(spark, table):
    """Sketches read raw files, so MoR deletion vectors are invisible
    to them — counting tombstoned values is a silent overcount beyond
    the documented error. Policy matches covariance_from_stats: refuse
    until the DVs are compacted away."""
    from parquet_rewriter_spark.operators.compact import compact
    from parquet_rewriter_spark.operators.deletion_vectors import (
        delete_keys_mor,
    )

    build_distinct_sketches(table, ["user"])
    delete_keys_mor(table, spark.createDataFrame([(3,)], "k long"))
    with pytest.raises(ValueError, match="deletion vectors"):
        approx_distinct_range(table, "user")
    # a range NOT overlapping the dv-bearing file still answers
    dv_file = next(e for e in table.manifest().files if e.dv_rows)
    assert dv_file.key_min <= 3 <= dv_file.key_max
    est = approx_distinct_range(table, "user", lower=dv_file.key_max + 1)
    assert est > 0
    compact(table, max_records_per_file=5_000)  # materializes the deletes
    assert approx_distinct_range(table, "user") > 0
