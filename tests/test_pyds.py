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


# ------------------------------------------ streaming changelog source


def test_changes_stream_matches_batch_feed_and_resumes(spark, sf_dir, tmp_path):
    """The commit-version-offset streaming source must deliver exactly
    the changelog's rows, and a checkpointed restart must deliver ONLY
    commits that landed after the first drain."""
    from pyspark.sql import functions as F

    from parquet_rewriter_spark.operators.merge import merge_into_table
    from parquet_rewriter_spark.sources.pyds import register_changes
    from parquet_rewriter_spark.sources.readers import load_table
    from parquet_rewriter_spark.table import SortedTable

    o = load_table(spark, sf_dir, "orders")
    t = SortedTable.create(spark, str(tmp_path / "feed"), o, key="o_orderkey",
                           max_records_per_file=500)
    for k in (3, 5):
        muts = o.filter(F.col("o_orderkey") % 50 == k).withColumn(
            "o_totalprice", F.lit(float(k))
        ).withColumn("op", F.lit("UPSERT"))
        merge_into_table(t, muts, changelog=True)

    register_changes(spark)
    ckpt = str(tmp_path / "ckpt")

    out_dir = str(tmp_path / "out")

    def drain():
        before = set()
        if os.path.isdir(out_dir):
            before = {f for f in os.listdir(out_dir) if f.endswith(".parquet")}
        q = (
            spark.readStream.format("sorted_table_changes")
            .option("path", t.path).load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        assert q.awaitTermination(120), "changes stream did not drain in 120s"
        new = [
            os.path.join(out_dir, f)
            for f in os.listdir(out_dir)
            if f.endswith(".parquet") and f not in before
        ]
        return spark.read.parquet(*new) if new else None

    got = drain()
    batch = spark.read.parquet(str(tmp_path / "feed" / "_changelog"))
    assert got.count() == batch.count()
    assert (
        got.groupBy("_change_type").count().orderBy("_change_type").collect()
        == batch.groupBy("_change_type").count().orderBy("_change_type").collect()
    )
    # values survive the tuple hand-off: per-commit totalprice sums match
    g = {r["_commit_version"]: r["s"] for r in got.groupBy("_commit_version")
         .agg(F.round(F.sum("o_totalprice"), 2).alias("s")).collect()}
    b = {r["_commit_version"]: r["s"] for r in batch.groupBy("_commit_version")
         .agg(F.round(F.sum("o_totalprice"), 2).alias("s")).collect()}
    assert g == b

    # a third commit, then a resumed drain sees ONLY it
    muts = o.filter(F.col("o_orderkey") % 50 == 7).withColumn(
        "o_totalprice", F.lit(7.0)
    ).withColumn("op", F.lit("UPSERT"))
    merge_into_table(t, muts, changelog=True)
    got2 = drain()
    versions = {r["_commit_version"] for r in got2.select("_commit_version").distinct().collect()}
    assert versions == {t.manifest().version}


def test_batch_source_filter_pushdown_prunes_and_stays_exact(spark, tmp_path):
    """pushFilters: key and secondary-stats comparisons must prune
    partitions (files) at planning time and row groups at read time,
    while results stay EXACT (Spark re-applies every filter)."""
    from pyspark.sql import functions as F

    from parquet_rewriter_spark.sources.pyds import (
        SortedTableDataSource,
        register,
    )
    from parquet_rewriter_spark.table import SortedTable

    df = spark.range(10_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 100).alias("grp"),
        (F.col("id") * 2.0).alias("v"),
    )
    t = SortedTable.create(spark, str(tmp_path / "t"), df, key="k",
                           max_records_per_file=1_000, stats_cols=["v"])
    register(spark)

    out = (
        spark.read.format("sorted_table").option("path", t.path).load()
        .filter((F.col("k") >= 2_500) & (F.col("k") < 3_500) & (F.col("v") <= 5_900.0))
    )
    exp = df.filter("k >= 2500 and k < 3500 and v <= 5900.0")
    assert out.count() == exp.count()
    assert out.agg(F.sum("v")).first()[0] == exp.agg(F.sum("v")).first()[0]

    # direct reader: pushed bounds must shrink the partition list
    from pyspark.sql.datasource import (
        GreaterThanOrEqual,
        LessThan,
        LessThanOrEqual,
    )

    from parquet_rewriter_spark.sources.pyds import SortedTablePushdownReader

    src = SortedTableDataSource({"path": t.path})
    reader = SortedTablePushdownReader({"path": t.path}, src._manifest())
    n_all = len(reader.partitions())
    unsupported = list(reader.pushFilters([
        GreaterThanOrEqual(("k",), 2_500),
        LessThan(("k",), 3_500),
        LessThanOrEqual(("v",), 5_900.0),
    ]))
    assert len(unsupported) == 3  # pruning-only: Spark re-applies all
    n_pruned = len(reader.partitions())
    assert n_pruned < n_all
    # v <= 5900 → k <= 2950: the key range [2500,3500) spans 2 files,
    # the v bound cuts it to the one file covering 2000-2999
    assert n_pruned == 1, (n_all, n_pruned)


def test_batch_source_in_filter_prunes_by_envelope(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql.datasource import In

    from parquet_rewriter_spark.sources.pyds import (
        SortedTableDataSource,
        SortedTablePushdownReader,
        register,
    )
    from parquet_rewriter_spark.table import SortedTable

    df = spark.range(10_000).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
    t = SortedTable.create(spark, str(tmp_path / "t"), df, key="k",
                           max_records_per_file=1_000)
    register(spark)
    out = (spark.read.format("sorted_table").option("path", t.path).load()
           .filter(F.col("k").isin(42, 57, 333)))
    assert sorted(r["k"] for r in out.collect()) == [42, 57, 333]

    src = SortedTableDataSource({"path": t.path})
    reader = SortedTablePushdownReader({"path": t.path}, src._manifest())
    list(reader.pushFilters([In(("k",), (42, 57, 333))]))
    assert len(reader.partitions()) == 1  # envelope [42, 333] → one file


def test_batch_source_prefix_pushdown_on_string_key(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql.datasource import StringStartsWith

    from parquet_rewriter_spark.sources.pyds import (
        SortedTableDataSource,
        SortedTablePushdownReader,
        register,
    )
    from parquet_rewriter_spark.table import SortedTable

    df = spark.range(2_000).select(
        F.format_string("key%04d", F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    t = SortedTable.create(spark, str(tmp_path / "t"), df, key="k",
                           max_records_per_file=500)
    register(spark)
    out = (spark.read.format("sorted_table").option("path", t.path).load()
           .filter(F.col("k").startswith("key03")))
    assert out.count() == 100  # key0300..key0399

    src = SortedTableDataSource({"path": t.path})
    reader = SortedTablePushdownReader({"path": t.path}, src._manifest())
    n_all = len(reader.partitions())
    list(reader.pushFilters([StringStartsWith(("k",), "key03")]))
    assert len(reader.partitions()) == 1 < n_all  # prefix → one file


def test_prefix_pushdown_supplementary_plane_not_pruned(spark, tmp_path):
    """A prefix's upper pruning bound must cover strings whose next
    char is a supplementary-plane code point: 'abc\\U0001F600' sorts
    ABOVE 'abc\\uffff', so the old prefix+'\\uffff' bound silently
    dropped matching rows (pruning is a correctness decision)."""
    from pyspark.sql import functions as F

    from parquet_rewriter_spark.sources.pyds import (
        _prefix_successor,
        register,
    )
    from parquet_rewriter_spark.table import SortedTable

    assert _prefix_successor("abc") == "abd"
    assert _prefix_successor("a\U0010ffff") == "b"
    assert _prefix_successor("\U0010ffff" * 3) is None
    assert "abc\U0001f600" < _prefix_successor("abc")
    assert not ("abc\U0001f600" < "abc￿")  # the old, wrong bound

    rows = [("abc\U0001f600dup", 1), ("abc￿", 2), ("abb", 3),
            ("abd", 4), ("zzz", 5)]
    df = spark.createDataFrame(rows, "k string, v int")
    t = SortedTable.create(spark, str(tmp_path / "t"), df, key="k",
                           max_records_per_file=1)
    register(spark)
    out = (spark.read.format("sorted_table").option("path", t.path).load()
           .filter(F.col("k").startswith("abc")))
    got = {r["v"] for r in out.collect()}
    assert got == {1, 2}  # the emoji row must survive pruning


def test_pyds_module_is_pickle_self_contained():
    """The sorted_table DataSources pickle BY VALUE into Spark's
    runner processes, which cannot import this package — so the pyds
    module must never reference the package from code that ships:
    no module-level intra-package imports, and function-level ones
    only inside the driver-side registration helpers."""
    import ast

    import parquet_rewriter_spark.sources.pyds as pyds

    tree = ast.parse(open(pyds.__file__).read())
    allowed = {"register", "register_changes", "_pickle_self_contained"}

    def pkg_imports(node):
        for n in ast.walk(node):
            if isinstance(n, ast.ImportFrom) and (n.module or "").startswith(
                "parquet_rewriter_spark"
            ):
                yield n
            if isinstance(n, ast.Import) and any(
                a.name.startswith("parquet_rewriter_spark") for a in n.names
            ):
                yield n

    offenders = []
    for node in tree.body:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            offenders += [f"module-level: line {n.lineno}" for n in pkg_imports(node)]
        elif isinstance(node, ast.FunctionDef) and node.name not in allowed:
            offenders += [
                f"{node.name}: line {n.lineno}" for n in pkg_imports(node)
            ]
        elif isinstance(node, ast.ClassDef):
            offenders += [
                f"class {node.name}: line {n.lineno}" for n in pkg_imports(node)
            ]
    assert not offenders, offenders
