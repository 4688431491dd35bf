"""Per-file covariance triples: exact answers, churn-proportional
refresh, double-build immunity, DV refusal."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from parquet_rewriter_spark.operators.covstats import (
    build_covariance_stats,
    covariance_from_stats,
)
from parquet_rewriter_spark.operators.merge import (
    OP_COLUMN,
    OP_UPSERT,
    merge_into_table,
)
from parquet_rewriter_spark.sources.readers import load_table
from parquet_rewriter_spark.table import SortedTable


def _numpy_cov(df, col="embedding"):
    X = np.stack([np.asarray(r[col], dtype=np.float64) for r in df.collect()])
    return X.shape[0], X.mean(axis=0), np.cov(X, rowvar=False, bias=True)


@pytest.fixture()
def table(spark, tmp_path, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return SortedTable.create(
        spark, str(tmp_path / "cov"), emb, key="vec_id", max_records_per_file=60
    )


def test_exact_after_build(table):
    built = build_covariance_stats(table, "embedding")
    assert built == len(table.manifest().files)
    n, mean, cov = covariance_from_stats(table, "embedding")
    en, emean, ecov = _numpy_cov(table.read())
    assert n == en
    np.testing.assert_allclose(mean, emean, atol=1e-12)
    np.testing.assert_allclose(cov, ecov, atol=1e-10)


def test_refresh_is_churn_proportional_and_exact(table):
    build_covariance_stats(table, "embedding")
    total = len(table.manifest().files)

    mut = (
        table.read()
        .filter(F.col("vec_id") < 50)  # contiguous keys → one dirty file
        .withColumn(
            "embedding",
            F.expr("transform(embedding, x -> CAST(x * 2 AS FLOAT))"),
        )
        .withColumn(OP_COLUMN, F.lit(OP_UPSERT))
    )
    merge_into_table(table, mut)

    rebuilt = build_covariance_stats(table, "embedding")
    assert 0 < rebuilt < total  # only the merge's rewritten files

    n, mean, cov = covariance_from_stats(table, "embedding")
    en, emean, ecov = _numpy_cov(table.read())
    assert n == en
    np.testing.assert_allclose(cov, ecov, atol=1e-10)


def test_double_build_does_not_double_count(table):
    build_covariance_stats(table, "embedding")
    n1, _, cov1 = covariance_from_stats(table, "embedding")
    # force a duplicate build of every file (simulates a racing writer)
    from parquet_rewriter_spark.operators.covstats import _build_for

    m = table.manifest()
    _build_for(table, [e.name for e in m.files], "embedding")
    n2, _, cov2 = covariance_from_stats(table, "embedding")
    assert n1 == n2
    np.testing.assert_allclose(cov1, cov2, atol=0)


def test_key_range_file_grain(table):
    build_covariance_stats(table, "embedding")
    m = table.manifest()
    upper = m.files[1].key_max  # first two files
    n, _, cov = covariance_from_stats(table, "embedding", upper=upper)
    kept = [e for e in m.files if e.key_min <= upper]
    import os

    direct = table.spark.read.parquet(
        *[os.path.join(table.path, e.name) for e in kept]
    )
    en, _, ecov = _numpy_cov(direct)
    assert n == en
    np.testing.assert_allclose(cov, ecov, atol=1e-10)


def test_refuses_dv_snapshots(table):
    from parquet_rewriter_spark.operators.deletion_vectors import delete_keys_mor

    build_covariance_stats(table, "embedding")
    victims = table.read().filter(F.col("vec_id") < 50).select("vec_id")
    delete_keys_mor(table, victims)
    with pytest.raises(ValueError, match="deletion vectors"):
        covariance_from_stats(table, "embedding")


def test_vacuum_prunes_dead_covstats_rows(table):
    """High-churn tables must not accrete sidecar rows for vacuumed
    files: after churn + vacuum, only live files keep triples, and the
    estimate stays exact."""
    import os

    from pyspark.sql import functions as F

    build_covariance_stats(table, "embedding")
    mut = (
        table.read().filter(F.col("vec_id") < 120)
        .withColumn("embedding", F.expr("transform(embedding, x -> CAST(x * 2 AS FLOAT))"))
        .withColumn(OP_COLUMN, F.lit(OP_UPSERT))
    )
    merge_into_table(table, mut)
    build_covariance_stats(table, "embedding")
    side = os.path.join(table.path, "_covstats")
    before = table.spark.read.parquet(side).count()

    table.vacuum(retain_versions=1)
    after_rows = table.spark.read.parquet(side).select("file").distinct().collect()
    live = {e.name for e in table.manifest().files}
    assert {r["file"] for r in after_rows} <= live
    assert table.spark.read.parquet(side).count() < before

    n, _, cov = covariance_from_stats(table, "embedding")
    en, _, ecov = _numpy_cov(table.read())
    assert n == en
    import numpy as np

    np.testing.assert_allclose(cov, ecov, atol=1e-10)
