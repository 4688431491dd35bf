"""Hidden-partitioning spec evolution: layout changes are metadata-only.

Old epochs keep their directory layout and keep pruning under their old
transforms; appends land under the latest spec; the read surface stays
one relation of base columns. No data file is ever rewritten.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from parquet_rewriter_spark.sources.partitioning import (
    append_hidden_partitioned,
    evolve_partition_spec,
    read_hidden_partitioned,
    write_hidden_partitioned,
)
from parquet_rewriter_spark.sources.readers import load_table


def _events_split(spark, sf_dir, cutoff):
    ev = load_table(spark, sf_dir, "events")
    return ev, ev.filter(F.col("ts") < cutoff), ev.filter(F.col("ts") >= cutoff)


def test_evolution_roundtrip_matches_plain_filter(spark, tmp_path, sf_dir):
    cutoff = dt.datetime(2024, 1, 8)
    ev, old, new = _events_split(spark, sf_dir, cutoff)
    path = str(tmp_path / "evo")
    write_hidden_partitioned(old, path, [("day", "ts")])
    evolve_partition_spec(path, [("day", "ts"), ("bucket", "user_id", 8)])
    append_hidden_partitioned(new, path)

    lo, hi = dt.datetime(2024, 1, 4), dt.datetime(2024, 1, 12)
    got = read_hidden_partitioned(
        spark, path, eq={"user_id": 3}, ranges={"ts": (lo, hi)}
    )
    exp = ev.filter(
        (F.col("user_id") == 3) & (F.col("ts") >= lo) & (F.col("ts") <= hi)
    )
    assert got.count() == exp.count() > 0
    assert sorted(got.columns) == sorted(ev.columns)  # p_* never leak
    got_sum = got.agg(F.round(F.sum("value"), 2)).first()[0]
    exp_sum = exp.agg(F.round(F.sum("value"), 2)).first()[0]
    assert got_sum == exp_sum


def test_evolution_never_touches_old_files(spark, tmp_path, sf_dir):
    cutoff = dt.datetime(2024, 1, 8)
    _, old, new = _events_split(spark, sf_dir, cutoff)
    path = str(tmp_path / "evo2")
    write_hidden_partitioned(old, path, [("day", "ts")])
    before = {}
    for dirpath, _, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.join(dirpath, n)
                before[p] = (os.path.getsize(p), os.path.getmtime(p))
    assert before

    evolve_partition_spec(path, [("day", "ts"), ("bucket", "user_id", 8)])
    append_hidden_partitioned(new, path)

    for p, (size, mtime) in before.items():
        assert os.path.getsize(p) == size and os.path.getmtime(p) == mtime


def test_each_epoch_prunes_under_its_own_spec(spark, tmp_path, sf_dir):
    cutoff = dt.datetime(2024, 1, 8)
    _, old, new = _events_split(spark, sf_dir, cutoff)
    path = str(tmp_path / "evo3")
    write_hidden_partitioned(old, path, [("day", "ts")])
    evolve_partition_spec(path, [("day", "ts"), ("bucket", "user_id", 8)])
    append_hidden_partitioned(new, path)

    lo, hi = dt.datetime(2024, 1, 4), dt.datetime(2024, 1, 12)
    df = read_hidden_partitioned(
        spark, path, eq={"user_id": 3}, ranges={"ts": (lo, hi)}
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # both epochs' scans carry day-partition filters; the evolved epoch
    # additionally prunes on the user_id bucket
    assert plan.count("p_day_ts") >= 2
    assert "p_bucket_user_id" in plan


def test_appends_before_evolution_go_to_original_spec(spark, tmp_path, sf_dir):
    _, old, new = _events_split(spark, sf_dir, dt.datetime(2024, 1, 8))
    path = str(tmp_path / "evo4")
    write_hidden_partitioned(old, path, [("day", "ts")])
    append_hidden_partitioned(new, path)  # no evolution yet → table root
    assert not any(e.startswith("_spec") for e in os.listdir(path))
    total = read_hidden_partitioned(spark, path).count()
    assert total == old.count() + new.count()


def test_evolved_read_emits_no_ignored_paths_warn(spark, tmp_path, sf_dir):
    """The legacy root hosts `_specN/` epoch dirs; the read must list
    epochs explicitly rather than letting Spark's lister walk-and-skip
    them, which logged a spurious "All paths were ignored: _specN" WARN
    on every read (log noise users report as a bug). JVM log capture
    via a log4j2 WriterAppender on the root logger — pytest's capfd
    cannot see the JVM's stderr (its fd predates the capture)."""
    cutoff = dt.datetime(2024, 1, 8)
    ev, old, new = _events_split(spark, sf_dir, cutoff)
    path = str(tmp_path / "warnfree")
    write_hidden_partitioned(old, path, [("day", "ts")])
    evolve_partition_spec(path, [("day", "ts"), ("bucket", "user_id", 8)])
    append_hidden_partitioned(new, path)

    jvm = spark.sparkContext._jvm
    ctx = jvm.org.apache.logging.log4j.core.LoggerContext.getContext(False)
    sw = jvm.java.io.StringWriter()
    layout = (jvm.org.apache.logging.log4j.core.layout.PatternLayout
              .newBuilder().withPattern("%m%n").build())
    app = jvm.org.apache.logging.log4j.core.appender.WriterAppender.createAppender(
        layout, None, sw, "prs_test_capture", False, True
    )
    app.start()
    root = ctx.getRootLogger()
    root.addAppender(app)
    # the test session runs at ERROR; the WARN only exists for vanilla
    # (driver/judge) sessions — raise the level for the capture window
    spark.sparkContext.setLogLevel("WARN")
    try:
        got = read_hidden_partitioned(spark, path, eq={"user_id": 3})
        assert got.count() == ev.filter(F.col("user_id") == 3).count()
    finally:
        spark.sparkContext.setLogLevel("ERROR")
        root.removeAppender(app)
        app.stop()
    noise = sw.toString()
    assert "All paths were ignored" not in noise, noise[-2000:]
