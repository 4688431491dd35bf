"""Secondary zone maps: manifest col_stats + read_where driver pruning."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from parquet_rewriter_spark.operators.compact import compact_incremental
from parquet_rewriter_spark.operators.merge import OP_COLUMN, merge_into_table
from parquet_rewriter_spark.table import SortedTable


@pytest.fixture()
def clustered_table(spark, tmp_path):
    """id-keyed table where ``grp`` correlates perfectly with the key —
    the layout where secondary zone maps actually prune."""
    df = spark.range(0, 10_000).select(
        F.col("id"),
        (F.col("id") / 100).cast("long").alias("grp"),
        (F.col("id") * 2.5).alias("val"),
    )
    return SortedTable.create(
        spark,
        str(tmp_path / "zm"),
        df,
        key="id",
        max_records_per_file=1_000,
        stats_cols=["grp", "val"],
    )


def test_manifest_records_secondary_stats(clustered_table):
    m = clustered_table.manifest()
    assert m.stats_cols == ["grp", "val"]
    assert len(m.files) == 10
    for e in m.files:
        assert set(e.col_stats) == {"grp", "val"}
        lo, hi = e.col_stats["grp"]
        # grp = id // 100 and files are 1000-row key ranges → 10 grp values per file
        assert hi - lo == 9


def test_read_where_prunes_files_and_matches_full_scan(clustered_table):
    df = clustered_table.read_where({"grp": (23, 31)})
    # grp 23..31 spans ids 2300..3199 → exactly 2 of the 10 files
    assert len(df.inputFiles()) == 2
    expected = clustered_table.read().filter(F.col("grp").between(23, 31))
    assert df.count() == expected.count() == 900
    assert df.agg(F.sum("val")).first()[0] == expected.agg(F.sum("val")).first()[0]


def test_read_where_open_bounds_and_key_column(clustered_table):
    # one-sided bound + a predicate on the KEY column (uses key_min/max)
    df = clustered_table.read_where({"grp": (95, None), "id": (None, 9_949)})
    assert len(df.inputFiles()) == 1
    assert df.count() == 450  # ids 9500..9949


def test_read_where_no_match_returns_empty_typed(clustered_table):
    df = clustered_table.read_where({"grp": (1_000, 2_000)})
    assert df.count() == 0
    # same names/types as a real scan (nullability differs: the stored
    # schema keeps range()'s non-null id, the parquet reader relaxes it)
    assert [(f.name, f.dataType) for f in df.schema.fields] == [
        (f.name, f.dataType) for f in clustered_table.read().schema.fields
    ]


def test_merge_preserves_secondary_stats(spark, clustered_table):
    muts = spark.range(500, 520).select(
        F.col("id"),
        F.lit(77).cast("long").alias("grp"),  # out-of-pattern value widens the file's range
        F.lit(-1.0).alias("val"),
    )
    res = merge_into_table(clustered_table, muts)
    assert res["files_dirty"] == 1
    m = clustered_table.manifest()
    assert m.stats_cols == ["grp", "val"]
    assert all(set(e.col_stats) == {"grp", "val"} for e in m.files)
    # the rewritten file (keys 0..999) now spans grp 0..77
    hit = [e for e in m.files if e.key_min <= 500 <= e.key_max]
    assert hit and hit[0].col_stats["grp"] == [0, 77]
    # pruning on grp=77 keeps the natural file (ids 7700-7799) AND the widened one
    df = clustered_table.read_where({"grp": (77, 77)})
    assert len(df.inputFiles()) == 2
    assert df.count() == 120  # 100 natural + 20 rewritten


def test_compact_preserves_stats_cols(spark, tmp_path):
    df = spark.range(0, 4_000).select(
        F.col("id"), (F.col("id") % 7).alias("m7")
    )
    t = SortedTable.create(
        spark,
        str(tmp_path / "zc"),
        df,
        key="id",
        max_records_per_file=250,
        stats_cols=["m7"],
    )
    muts = spark.range(10_000, 10_050).select(
        F.col("id"), (F.col("id") % 7).alias("m7")
    ).withColumn(OP_COLUMN, F.lit("UPSERT"))
    merge_into_table(t, muts, allow_splice=False)
    compact_incremental(t, target_records_per_file=250, min_fill=0.9)
    m = t.manifest()
    assert m.stats_cols == ["m7"]
    assert all("m7" in e.col_stats for e in m.files)
    assert t.read().count() == 4_050


def test_splice_path_records_secondary_stats(spark, tmp_path):
    df = spark.range(0, 5_000).select(
        F.col("id"), (F.col("id") / 500).cast("long").alias("bucket")
    )
    t = SortedTable.create(
        spark,
        str(tmp_path / "zs"),
        df,
        key="id",
        max_records_per_file=1_000,
        stats_cols=["bucket"],
    )
    muts = spark.createDataFrame([(1_234, 99)], "id long, bucket long")
    res = merge_into_table(t, muts)
    assert res["path"] == "rowgroup_splice"
    m = t.manifest()
    spliced = [e for e in m.files if e.key_min <= 1_234 <= e.key_max]
    assert spliced and spliced[0].col_stats["bucket"][1] == 99


# ------------------------------------------------------- scan routing


def test_smart_read_routes_and_never_changes_results(spark, sf_dir, tmp_path):
    from parquet_rewriter_spark.operators.router import smart_read
    from parquet_rewriter_spark.sources.readers import load_table
    from parquet_rewriter_spark.table import SortedTable

    o = load_table(spark, sf_dir, "orders")
    t = SortedTable.create(
        spark, str(tmp_path / "routed"), o, key="o_orderkey",
        max_records_per_file=200, stats_cols=["o_totalprice"],
        bloom_cols=["o_custkey"],
    )
    # key range → zone maps, strictly pruned, exact rows
    df, rep = smart_read(t, ranges={"o_orderkey": (10, 60)})
    assert rep["strategy"] == "zone_maps"
    assert rep["files_scanned"] < rep["files_total"]
    assert df.count() == o.filter("o_orderkey BETWEEN 10 AND 60").count()

    # bloom equality on the unclustered column
    df, rep = smart_read(t, equals={"o_custkey": [7]})
    assert rep["strategy"] == "bloom"
    assert df.count() == o.filter("o_custkey = 7").count()

    # untracked column → full scan, still exact
    df, rep = smart_read(t, equals={"o_orderstatus": ["F"]})
    assert rep["strategy"] == "full_scan"
    assert rep["files_scanned"] == rep["files_total"]
    assert df.count() == o.filter("o_orderstatus = 'F'").count()

    # combined: zone-mapped range + residual equality applies both
    df, rep = smart_read(
        t, ranges={"o_orderkey": (10, 600)}, equals={"o_orderstatus": ["F"]}
    )
    assert rep["strategy"] == "zone_maps"
    assert df.count() == o.filter(
        "o_orderkey BETWEEN 10 AND 600 AND o_orderstatus = 'F'"
    ).count()


def test_column_storage_report_consistency(spark, tmp_path):
    """Footer-walk storage report: per-column value counts equal the
    row count, per-column byte totals are positive and sum to less than
    the physical file sizes (footer + headers are the remainder)."""
    import os

    from pyspark.sql import functions as F

    from parquet_rewriter_spark.stats import column_storage_report
    from parquet_rewriter_spark.table import SortedTable

    df = spark.range(5_000).select(
        F.col("id").alias("k"),
        (F.col("id") * 2.0).alias("v"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
    )
    t = SortedTable.create(spark, str(tmp_path / "t"), df, key="k",
                           max_records_per_file=1_000)
    rep = {r["column"]: r for r in
           column_storage_report(spark, t.file_paths()).collect()}
    assert set(rep) == {"k", "v", "s"}
    n_files = len(t.manifest().files)
    for c, r in rep.items():
        assert r["n_values"] == 5_000
        assert r["n_chunks"] >= n_files
        assert 0 < r["compressed_bytes"]
        assert r["compressed_bytes"] <= r["uncompressed_bytes"] * 2
    total_phys = sum(e.bytes for e in t.manifest().files)
    assert sum(r["compressed_bytes"] for r in rep.values()) < total_phys
