"""`sorted_table` Python DataSource: correctness, planning-time zone-map
pruning, time travel, and open-ended ranges."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from parquet_rewriter_spark.sources.pyds import (
    SortedTableDataSource,
    SortedTableReader,
    register,
)
from parquet_rewriter_spark.sources.readers import load_table
from parquet_rewriter_spark.table import SortedTable


def _orders_table(spark, sf_dir, d):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return SortedTable.create(
        spark, os.path.join(d, "t"), o, key="o_orderkey", max_records_per_file=200
    ), o


def _read_ds(spark, path, lo=None, hi=None, version=None):
    register(spark)
    r = spark.read.format("sorted_table").option("path", path)
    if lo is not None:
        r = r.option("key_lo", str(lo))
    if hi is not None:
        r = r.option("key_hi", str(hi))
    if version is not None:
        r = r.option("version", str(version))
    return r.load()


def test_range_scan_matches_plain_filter(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="prs_test_pyds_")
    try:
        t, o = _orders_table(spark, sf_dir, d)
        got = _read_ds(spark, t.path, lo=100, hi=599)
        want = o.filter(F.col("o_orderkey").between(100, 599))
        assert got.count() == want.count()
        assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
        # open-ended and unbounded variants
        assert _read_ds(spark, t.path, lo=1000).count() == o.filter(
            F.col("o_orderkey") >= 1000
        ).count()
        assert _read_ds(spark, t.path).count() == o.count()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_partition_planning_prunes_files(spark, sf_dir):
    """The reader must emit one InputPartition per OVERLAPPING manifest
    file only — pruning is visible at planning time, before any task."""
    d = tempfile.mkdtemp(prefix="prs_test_pyds_prune_")
    try:
        t, o = _orders_table(spark, sf_dir, d)
        files = t.manifest().files
        assert len(files) > 3  # the table actually has multiple files
        lo, hi = 100, 399
        overlapping = [
            f for f in files if not (f.key_min > hi or f.key_max < lo)
        ]
        ds = SortedTableDataSource(
            options={"path": t.path, "key_lo": str(lo), "key_hi": str(hi)}
        )
        parts = ds.reader(ds.schema()).partitions()
        assert len(parts) == len(overlapping) < len(files)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_version_option_time_travels(spark, sf_dir):
    from parquet_rewriter_spark.operators.merge import merge_into_table

    d = tempfile.mkdtemp(prefix="prs_test_pyds_tt_")
    try:
        t, o = _orders_table(spark, sf_dir, d)
        v0 = t.manifest().version
        n0 = o.count()
        muts = (
            o.limit(10)
            .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10_000_000))
            .withColumn("op", F.lit("UPSERT"))
        )
        merge_into_table(t, muts)
        assert _read_ds(spark, t.path).count() == n0 + 10
        assert _read_ds(spark, t.path, version=v0).count() == n0
    finally:
        shutil.rmtree(d, ignore_errors=True)
