"""Distributed PCA over an embedding column — one pass, tiny shuffle.

The classic two-level scheme for covariance at scale: each partition
reduces its rows to the sufficient statistics ``(n, Σx, ΣxxT)`` with one
BLAS syrk-shaped matmul (Arrow-batched ``mapInPandas``), the driver sums
the per-partition triples and closes the form::

    mean = Σx / n
    cov  = ΣxxT / n − mean·meanT          (population covariance)

Shuffle volume is ONE ROW PER PARTITION (d + d² doubles ≈ 33 KB at
d = 64) regardless of row count — at 100 TB the reduce is still a few
MB. The eigendecomposition is d×d on the driver (numpy ``eigh``,
symmetric), and projection is a broadcast d×k matmul back over the rows
— no iteration, no global shuffle anywhere.

Exactness: the sufficient statistics are plain float64 sums, so the
covariance is algebraically identical to the single-machine result up
to summation order — the catalog oracle replays variance/covariance
entries in DuckDB and matches at 4 decimals.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def covariance_stats(df: DataFrame, vec_col: str = "embedding"):
    """(n, mean, cov) of a fixed-dim array column. Population (÷ n)
    covariance, float64. One Spark job; collects one row per partition."""
    from parquet_rewriter_spark.ship import ensure_shipped

    ensure_shipped(df.sparkSession)  # workers unpickle module-level helpers

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        ss = None
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            n += X.shape[0]
            s = X.sum(axis=0) if s is None else s + X.sum(axis=0)
            g = X.T @ X
            ss = g if ss is None else ss + g
        if n == 0:
            return
        yield pd.DataFrame(
            {"n": [n], "s": [s.tobytes()], "ss": [ss.tobytes()]}
        )

    rows = (
        df.select(vec_col)
        .mapInPandas(partials, "n long, s binary, ss binary")
        .collect()  # bounded: one row per partition
    )
    if not rows:
        raise ValueError("covariance_stats over an empty relation")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.frombuffer(r["s"]) for r in rows], axis=0)
    d = s.shape[0]
    ss = np.sum(
        [np.frombuffer(r["ss"]).reshape(d, d) for r in rows], axis=0
    )
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    return n, mean, cov


def pca_components(df: DataFrame, k: int, vec_col: str = "embedding"):
    """Top-k principal axes. Returns (eigenvalues desc (k,), components
    (k, d) rows = axes, mean (d,), total_variance). Sign-normalized so
    each axis' largest-|coordinate| entry is positive (eigh's sign is
    otherwise arbitrary — determinism matters for replayable queries)."""
    n, mean, cov = covariance_stats(df, vec_col)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    vals, vecs = vals[order], vecs[:, order].T  # rows = components
    for i in range(vecs.shape[0]):
        j = np.argmax(np.abs(vecs[i]))
        if vecs[i, j] < 0:
            vecs[i] = -vecs[i]
    return vals, vecs, mean, float(np.trace(cov))


def pca_project(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Append a length-k array column: the centered projection onto the
    top-k principal axes. The (k, d) component matrix rides the closure
    (broadcast with the task binary — ~32 KB at d=64), so the projection
    is a map-only stage: no shuffle, no second pass over the data."""
    from parquet_rewriter_spark.ship import ensure_shipped

    ensure_shipped(df.sparkSession)
    _, comps, mean, _ = pca_components(df, k, vec_col)
    cols = df.columns

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            P = (X - mean) @ comps.T
            out = pdf.copy()
            out[out_col] = list(P)
            yield out

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(project, f"{schema}, {out_col} array<double>").select(
        *cols, out_col
    )


def mahalanobis_scores(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "m2",
    ridge: float = 1e-9,
) -> DataFrame:
    """Append the squared Mahalanobis distance of each vector to the
    corpus distribution: m² = (x−μ)ᵀ Σ⁻¹ (x−μ) with (μ, Σ) the
    population moments from the one-pass sufficient statistics. The
    symmetric whitener W = Q Λ^{−1/2} Qᵀ (eigenvalues floored at
    ``ridge`` for numerical rank-deficiency) rides the closure, so the
    scoring pass is map-only — same plan shape as pca_project.

    Built-in invariant the oracle can pin EXACTLY: for any data,
    E[m²] = trace(Σ⁻¹Σ) = d when Σ comes from the same population —
    avg(m2) over the corpus must equal the embedding dimension to
    float precision, which checks μ, Σ, the inversion, and the scoring
    pass all at once. Use: embedding outlier screens (large m² = far
    from the corpus in whitened space — a better filter than raw L2
    when dimensions are correlated or differently scaled)."""
    from parquet_rewriter_spark.ship import ensure_shipped

    ensure_shipped(df.sparkSession)
    _, mean, cov = covariance_stats(df, vec_col)
    vals, vecs = np.linalg.eigh(cov)
    vals = np.maximum(vals, ridge)
    W = vecs @ np.diag(1.0 / np.sqrt(vals)) @ vecs.T
    cols = df.columns

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            Z = (X - mean) @ W
            out = pdf.copy()
            out[out_col] = (Z * Z).sum(axis=1)
            yield out

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(score, f"{schema}, {out_col} double").select(
        *cols, out_col
    )
