"""Compaction (R15 bulk re-chunk) invariants: content identical, file
count follows the target size, sortedness + manifest exactness hold."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_rewriter_spark.operators.compact import compact
from parquet_rewriter_spark.sources.readers import load_table
from parquet_rewriter_spark.table import SortedTable


def test_compact_rechunks_without_changing_content(spark, tmp_path, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    t = SortedTable.create(
        spark, str(tmp_path / "t"), orders, key="o_orderkey", max_records_per_file=100
    )
    files_before = len(t.manifest().files)
    before = sorted(r.o_orderkey for r in t.read().select("o_orderkey").collect())

    stats = compact(t, max_records_per_file=1000)

    m = t.manifest()
    assert stats["files_after"] == len(m.files) < files_before
    after = sorted(r.o_orderkey for r in t.read().select("o_orderkey").collect())
    assert after == before  # content preserved exactly

    # manifest ranges are exact and files internally sorted
    for e in m.files:
        df = spark.read.parquet(f"{t.path}/{e.name}")
        keys = [r.o_orderkey for r in df.select("o_orderkey").collect()]
        assert keys == sorted(keys)
        assert keys[0] == e.key_min and keys[-1] == e.key_max and len(keys) == e.rows


def test_compact_after_merge_restores_file_sizes(spark, tmp_path, sf_dir):
    """Merge fragments the layout (small mutation files); compact heals it."""
    from parquet_rewriter_spark.operators.merge import OP_COLUMN, OP_UPSERT, merge_into_table

    orders = load_table(spark, sf_dir, "orders")
    t = SortedTable.create(
        spark, str(tmp_path / "t2"), orders, key="o_orderkey", max_records_per_file=500
    )
    muts = (
        orders.limit(50)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)  # tail inserts
        .withColumn(OP_COLUMN, F.lit(OP_UPSERT))
    )
    merge_into_table(t, muts)
    n_total = t.read().count()
    assert n_total == orders.count() + 50

    compact(t, max_records_per_file=2000)
    assert t.read().count() == n_total
    # no duplicate keys after the full cycle
    assert t.read().select("o_orderkey").distinct().count() == n_total


def test_incremental_compact_touches_only_undersized_files(spark, tmp_path, sf_dir):
    """Fragment the layout with small tail-insert merges, then heal it
    incrementally: adequately-sized files must survive BY NAME (never
    read, never rewritten); content must be unchanged."""
    from parquet_rewriter_spark.operators.compact import compact_incremental
    from parquet_rewriter_spark.operators.merge import OP_COLUMN, OP_UPSERT, merge_into_table

    orders = load_table(spark, sf_dir, "orders")
    t = SortedTable.create(
        spark, str(tmp_path / "ti"), orders, key="o_orderkey", max_records_per_file=2000
    )
    for batch in range(4):  # four tiny tail-insert merges → four small files
        muts = (
            orders.limit(30)
            .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000 + batch * 1000)
            .withColumn(OP_COLUMN, F.lit(OP_UPSERT))
        )
        merge_into_table(t, muts, allow_splice=False)
    m_before = t.manifest()
    big_names = {e.name for e in m_before.files if e.rows >= 1000}
    small_names = {e.name for e in m_before.files if e.rows < 1000}
    assert len(small_names) >= 2, "fixture should have fragmented the layout"
    before = sorted(r.o_orderkey for r in t.read().select("o_orderkey").collect())

    stats = compact_incremental(t, target_records_per_file=2000, min_fill=0.5)

    assert stats["files_compacted"] == len(small_names)
    assert stats["files_passthrough"] == len(big_names)
    m_after = t.manifest()
    names_after = {e.name for e in m_after.files}
    assert big_names <= names_after  # untouched files survive by name
    assert not (small_names & names_after)  # small files all replaced
    after = sorted(r.o_orderkey for r in t.read().select("o_orderkey").collect())
    assert after == before
    # healed files actually reach the fill threshold
    new = [e for e in m_after.files if e.name not in big_names]
    assert all(e.rows >= 120 for e in new) and len(new) < len(small_names)


def test_incremental_compact_noop_below_two_small_files(spark, tmp_path, sf_dir):
    from parquet_rewriter_spark.operators.compact import compact_incremental

    orders = load_table(spark, sf_dir, "orders")
    t = SortedTable.create(
        spark, str(tmp_path / "tn"), orders, key="o_orderkey", max_records_per_file=2000
    )
    v = t.manifest().version
    stats = compact_incremental(t, target_records_per_file=2000)
    assert stats["files_compacted"] == 0 and t.manifest().version == v


def test_layout_report_drives_compaction(spark, sf_dir, tmp_path):
    """Fragment a table with merges, read the layout report, compact,
    and watch the health numbers recover — the report is the scheduler
    input, so its fields must track reality exactly."""
    from pyspark.sql import functions as F

    from parquet_rewriter_spark.operators.compact import compact
    from parquet_rewriter_spark.operators.layout import table_layout_report
    from parquet_rewriter_spark.operators.merge import merge_into_table
    from parquet_rewriter_spark.sources.readers import load_table
    from parquet_rewriter_spark.table import SortedTable

    o = load_table(spark, sf_dir, "orders")
    t = SortedTable.create(
        spark, str(tmp_path / "lay"), o, key="o_orderkey", max_records_per_file=400
    )
    n0 = o.count()
    # fragmenting merges: gap inserts (brand-new keys) land as tiny
    # fresh files — three head-insert batches → three small files
    max_key = o.agg(F.max("o_orderkey")).first()[0]
    for i, base in enumerate((-10, max_key + 10, max_key + 100)):
        mut = (
            o.limit(2)
            .withColumn("o_orderkey", F.lit(base) + F.monotonically_increasing_id())
            .withColumn("op", F.lit("UPSERT"))
        )
        merge_into_table(t, mut, allow_splice=False)
        n0 += 2
    before = table_layout_report(t, target_rows=400).first()
    assert before["n_rows"] == n0
    assert before["n_small_files"] > 0
    compact(t, max_records_per_file=400)
    after = table_layout_report(t, target_rows=400).first()
    assert after["n_small_files"] < before["n_small_files"]
    assert after["n_files"] <= before["n_files"]
    assert after["max_key_overlap_depth"] <= before["max_key_overlap_depth"]
    assert after["n_rows"] == n0


def test_auto_optimize_policy(spark, sf_dir, tmp_path):
    """Healthy table → no action (one manifest read); many small files
    → incremental heal; deep key overlap → full compaction."""
    from pyspark.sql import functions as F

    from parquet_rewriter_spark.operators.maintenance import auto_optimize
    from parquet_rewriter_spark.operators.merge import merge_into_table
    from parquet_rewriter_spark.sources.readers import load_table
    from parquet_rewriter_spark.table import SortedTable

    o = load_table(spark, sf_dir, "orders")
    t = SortedTable.create(
        spark, str(tmp_path / "opt"), o, key="o_orderkey", max_records_per_file=400
    )
    r = auto_optimize(t, target_rows=400)
    assert r["action"] == "none"

    # inject small-file litter via gap inserts beyond the key range
    max_key = o.agg(F.max("o_orderkey")).first()[0]
    for base in range(1, 6):
        mut = (
            o.limit(1)
            .withColumn("o_orderkey", F.lit(max_key + base * 10))
            .withColumn("op", F.lit("UPSERT"))
        )
        merge_into_table(t, mut, allow_splice=False)
    r2 = auto_optimize(t, target_rows=400)
    assert r2["action"] in ("compact_incremental", "compact_full")
    assert r2["after"]["n_small_files"] < r2["before"]["n_small_files"]
    n = t.read().count()
    r3 = auto_optimize(t, target_rows=400)
    assert r3["action"] == "none"
    assert t.read().count() == n


def test_compact_report_carries_phase_timings_and_io_counters(spark, tmp_path):
    """compact() mirrors merge_into_table's instrumentation surface
    (the reference's phase counters, ParquetRewriter.java:349-359):
    wall-time split plus rows/bytes read vs written."""
    import os

    from pyspark.sql import Row

    from parquet_rewriter_spark.operators.compact import compact
    from parquet_rewriter_spark.table import SortedTable

    df = spark.createDataFrame(
        [Row(key=i, v=i % 5) for i in range(3_000)], "key long, v long"
    )
    t = SortedTable.create(
        spark, os.path.join(str(tmp_path), "ci"), df, "key",
        max_records_per_file=100,
    )
    res = compact(t, max_records_per_file=1_000)
    for k in ("t_write_s", "t_commit_s", "rows_read", "bytes_read", "bytes_written"):
        assert k in res and res[k] >= 0, k
    assert res["rows_read"] == 3_000
    assert res["bytes_read"] > 0 and res["bytes_written"] > 0
