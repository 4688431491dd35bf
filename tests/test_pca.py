"""Distributed PCA: sufficient-statistics covariance must equal numpy's
single-machine answer, projections must be decorrelated with variances
equal to the eigenvalues, and everything must be deterministic."""

from __future__ import annotations

import numpy as np
import pytest

from parquet_rewriter_spark.operators.pca import (
    covariance_stats,
    pca_components,
    pca_project,
)
from parquet_rewriter_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = load_table(spark, sf_dir, "embeddings").repartition(7)  # force partials
    X = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in df.collect()]
    )
    return df, X


def test_covariance_matches_numpy(emb):
    df, X = emb
    n, mean, cov = covariance_stats(df)
    assert n == X.shape[0]
    np.testing.assert_allclose(mean, X.mean(axis=0), rtol=0, atol=1e-12)
    np.testing.assert_allclose(cov, np.cov(X, rowvar=False, bias=True), atol=1e-10)


def test_projection_is_decorrelated_with_eigen_variances(emb):
    df, X = emb
    k = 6
    vals, comps, mean, total = pca_components(df, k)
    assert vals[0] >= vals[-1] > 0
    # rows are orthonormal axes
    np.testing.assert_allclose(comps @ comps.T, np.eye(k), atol=1e-10)

    P = np.stack(
        [np.asarray(r["pca"]) for r in pca_project(df, k).sort("vec_id").collect()]
    )
    pcov = np.cov(P, rowvar=False, bias=True)
    np.testing.assert_allclose(pcov, np.diag(vals), atol=1e-8)
    # top-k explained variance is a growing fraction of the trace
    assert 0 < vals.sum() / total <= 1 + 1e-12


def test_projection_preserves_other_columns_and_is_deterministic(emb):
    df, _ = emb
    out1 = pca_project(df, 3).sort("vec_id").collect()
    out2 = pca_project(df, 3).sort("vec_id").collect()
    assert [r["vec_id"] for r in out1] == [r["vec_id"] for r in out2]
    assert all(r1["pca"] == r2["pca"] for r1, r2 in zip(out1, out2))
    assert {"vec_id", "embedding", "label", "pca"} == set(out1[0].asDict())


def test_empty_relation_raises(spark, sf_dir):
    df = load_table(spark, sf_dir, "embeddings").filter("vec_id < 0")
    with pytest.raises(ValueError):
        covariance_stats(df)


def test_mahalanobis_mean_equals_dimension_and_matches_numpy(emb):
    from parquet_rewriter_spark.operators.pca import mahalanobis_scores

    df, X = emb
    rows = mahalanobis_scores(df).select("vec_id", "m2").sort("vec_id").collect()
    m2 = np.array([r["m2"] for r in rows])
    # E[m2] == d exactly when (mu, cov) are the population moments
    assert abs(m2.mean() - X.shape[1]) < 1e-8

    data = df.select("vec_id", "embedding").sort("vec_id").collect()
    Xs = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in data])
    mu = Xs.mean(axis=0)
    S = np.cov(Xs, rowvar=False, bias=True)
    direct = np.einsum("ij,jk,ik->i", Xs - mu, np.linalg.inv(S), Xs - mu)
    np.testing.assert_allclose(m2, direct, rtol=1e-6)
