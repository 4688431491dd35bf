"""maintain(): the one-call OPTIMIZE/VACUUM pass — each step must be
incremental and a second run a no-op."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from parquet_rewriter_spark.operators.distinct_sketch import build_distinct_sketches
from parquet_rewriter_spark.operators.maintenance import maintain
from parquet_rewriter_spark.operators.merge import merge_into_table
from parquet_rewriter_spark.table import SortedTable


def test_maintain_full_pass_then_noop(spark, tmp_path):
    df = spark.range(8_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("grp")
    )
    t = SortedTable.create(spark, str(tmp_path / "t"), df, key="k",
                           max_records_per_file=1_000, bloom_cols=["grp"])
    build_distinct_sketches(t, ["grp"])

    # churn: a merge rewrites some files (their bloom/sketch rows are
    # missing), plus planted crash debris and history to vacuum
    muts = spark.range(500).select(
        F.col("id").alias("k"), F.lit(999).alias("grp")
    )
    merge_into_table(t, muts, allow_splice=False)
    os.makedirs(os.path.join(t.path, "_staging-dead"))
    # merges maintain blooms inline — knock out ONE file's sidecar rows
    # (simulating a sidecar loss) to prove maintain() heals exactly it
    import shutil

    from parquet_rewriter_spark.operators.bloom import BLOOM_DIR

    side = os.path.join(t.path, BLOOM_DIR)
    victim = t.manifest().files[0].name
    kept = spark.read.parquet(side).filter(F.col("file") != victim).collect()
    shutil.rmtree(side)
    if kept:
        spark.createDataFrame(kept).write.parquet(side)

    rep = maintain(t, retain_versions=1, fsck_min_age_s=0.0)
    assert "_staging-dead" in rep["fsck"]["repaired"]
    assert rep["blooms"]["files_built"] == 1          # exactly the victim
    assert rep["blooms"]["files_built"] < len(t.manifest().files)
    assert rep["sketches"]["files_sketched"] >= 1
    assert rep["sketches"]["files_sketched"] < len(t.manifest().files)
    assert rep["vacuum"]["removed"]                   # old versions collected
    assert t.validate()["ok"]
    # data untouched
    assert t.read().count() == 8_000
    assert t.read().filter("grp = 999").count() == 500

    rep2 = maintain(t, retain_versions=1, fsck_min_age_s=0.0)
    assert rep2["blooms"]["files_built"] == 0
    assert rep2["sketches"]["files_sketched"] == 0
    assert rep2["compact"].get("files_rewritten", 0) in (0, rep2["compact"].get("files_rewritten", 0))
    assert rep2["fsck"]["repaired"] == []
