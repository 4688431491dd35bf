"""Mergeable quantile digests (t-digest, merging variant).

Spark's built-in ``percentile_approx`` answers one query over one scan.
What a 100 TB pipeline wants is the *mergeable-summary* form (Dunning &
Ertl, "Computing extremely accurate quantiles using t-digests"): build
a tiny digest per partition/file/segment ONCE, persist it like a zone
map, then answer any later quantile question — over any subset of
segments — by merging digests, never rescanning data. Merging is
associative and loss-bounded, so digests compose across files, days,
and tables.

Accuracy: centroids are size-capped by the k1-ish bound
``4·n·q(1−q)/δ`` (δ = ``compression``), so rank error concentrates at
the median (~1/δ) and vanishes toward the tails — the right shape for
p99/p999 monitoring. A digest is ≤ ~2δ (mean, weight) pairs ≈ 3 KB at
δ=200, regardless of input size.

Plan shapes:
- ``partition_digests`` — one mapInPandas pass, NO shuffle: each
  partition emits one digest row.
- ``column_digest`` / ``approx_quantiles`` — the partition digests
  (≤ one row each) merge on the driver; this mirrors how Spark's own
  approxQuantile collects per-partition summaries, and is exactly the
  bounded-collect the engine allows (rows ∝ partitions, not data).
- ``grouped_quantiles`` — applyInPandas per group: one hash shuffle on
  the group key, digest + query inside the group kernel (useful when
  per-group exact sort would skew; output is one row per group).
- ``file_digests`` — digests keyed by source file, the persistable
  sidecar form (quantiles of any file subset without rescan).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


# ---------------- numpy digest kernel ----------------


def _k1(q: float, compression: int) -> float:
    """The k1 scale function (δ/2π)·asin(2q−1): steep at the tails, flat
    at the median — centroids merge while spanning ≤ 1 unit of k, which
    caps the digest at ~δ centroids and concentrates resolution where
    quantile queries need it (p99 ≫ p50)."""
    return (compression / (2.0 * np.pi)) * float(np.arcsin(2.0 * q - 1.0))


def _compress(
    means: np.ndarray, weights: np.ndarray, compression: int
) -> tuple[np.ndarray, np.ndarray]:
    """Merge sorted centroids while the merged span stays within one
    unit of the k1 scale (the standard merging-digest criterion)."""
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = float(means[0]), float(weights[0])
    w_before = 0.0  # weight strictly before the current centroid
    k_left = _k1(0.0, compression)
    for m, w in zip(means[1:], weights[1:]):
        q_right = (w_before + cur_w + float(w)) / total
        if _k1(q_right, compression) - k_left <= 1.0:
            # weighted mean keeps the centroid unbiased
            cur_m = (cur_m * cur_w + float(m) * float(w)) / (cur_w + float(w))
            cur_w += float(w)
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_before += cur_w
            k_left = _k1(w_before / total, compression)
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def digest_of(values: np.ndarray, compression: int = 200) -> tuple[np.ndarray, np.ndarray]:
    """Digest of a raw value array (NaNs dropped)."""
    v = np.asarray(values, dtype="float64")
    v = v[~np.isnan(v)]
    if len(v) == 0:
        return np.empty(0), np.empty(0)
    return _compress(v, np.ones(len(v)), compression)


def merge_digests(
    digests: Sequence[tuple[np.ndarray, np.ndarray]], compression: int = 200
) -> tuple[np.ndarray, np.ndarray]:
    """Merge any number of digests into one (associative, loss-bounded)."""
    parts = [(m, w) for m, w in digests if len(m)]
    if not parts:
        return np.empty(0), np.empty(0)
    means = np.concatenate([m for m, _ in parts])
    weights = np.concatenate([w for _, w in parts])
    return _compress(means, weights, compression)


def quantile_from_digest(
    means: np.ndarray, weights: np.ndarray, probs: Sequence[float]
) -> list[float]:
    """Interpolated quantile estimates from a digest (centroid midpoints
    as knots — the standard t-digest inversion)."""
    if len(means) == 0:
        return [float("nan")] * len(probs)
    total = float(weights.sum())
    cum = np.cumsum(weights) - weights / 2.0  # centroid midpoints in rank space
    out = []
    for p in probs:
        target = p * total
        out.append(float(np.interp(target, cum, means)))
    return out


# ---------------- Spark surface ----------------

_DIGEST_SCHEMA = "means array<double>, weights array<double>"


def partition_digests(df: DataFrame, col: str, compression: int = 200) -> DataFrame:
    """One digest row per partition — a single narrow pass, no shuffle."""
    from parquet_rewriter_spark.ship import ensure_shipped

    ensure_shipped(df.sparkSession)  # workers unpickle module-level helpers


    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: list[tuple[np.ndarray, np.ndarray]] = []
        for pdf in batches:
            acc.append(digest_of(pdf[col].to_numpy(), compression))
        m, w = merge_digests(acc, compression)
        yield pd.DataFrame({"means": [list(m)], "weights": [list(w)]})

    return df.select(F.col(col).cast("double").alias(col)).mapInPandas(
        build, schema=_DIGEST_SCHEMA
    )


def column_digest(
    df: DataFrame, col: str, compression: int = 200
) -> tuple[np.ndarray, np.ndarray]:
    """Whole-relation digest: partition digests merged on the driver
    (rows collected ∝ partitions — the same bounded collect Spark's own
    approxQuantile does)."""
    rows = partition_digests(df, col, compression).collect()
    return merge_digests(
        [(np.asarray(r["means"]), np.asarray(r["weights"])) for r in rows],
        compression,
    )


def approx_quantiles(
    df: DataFrame, col: str, probs: Sequence[float], compression: int = 200
) -> list[float]:
    """Quantile estimates for ``probs`` from one digest pass."""
    m, w = column_digest(df, col, compression)
    return quantile_from_digest(m, w, probs)


def grouped_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    col: str,
    probs: Sequence[float],
    compression: int = 200,
) -> DataFrame:
    """Per-group quantile estimates: one hash shuffle on the group key,
    digest built and inverted inside the group kernel. Output: group
    cols + ``q_<prob>`` columns, one row per group."""
    from parquet_rewriter_spark.ship import ensure_shipped

    ensure_shipped(df.sparkSession)  # workers unpickle module-level helpers

    probs = list(probs)
    qcols = [f"q_{str(p).replace('.', '_')}" for p in probs]
    out_schema = ", ".join(
        [f"{c} {t}" for c, t in df.select(*group_cols).dtypes]
        + [f"{qc} double" for qc in qcols]
    )

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        m, w = digest_of(pdf[col].to_numpy(), compression)
        est = quantile_from_digest(m, w, probs)
        row = {c: [k] for c, k in zip(group_cols, key)}
        row.update({qc: [e] for qc, e in zip(qcols, est)})
        return pd.DataFrame(row)

    return (
        df.select(*group_cols, F.col(col).cast("double").alias(col))
        .groupBy(*group_cols)
        .applyInPandas(kernel, schema=out_schema)
    )


def file_digests(df: DataFrame, col: str, compression: int = 200) -> DataFrame:
    """Digests keyed by source file — the persistable sidecar form.
    Store the output next to a table's manifest and any later quantile
    question over any FILE SUBSET is a digest merge, not a rescan."""
    from parquet_rewriter_spark.ship import ensure_shipped

    ensure_shipped(df.sparkSession)  # workers unpickle module-level helpers


    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        m, w = digest_of(pdf[col].to_numpy(), compression)
        return pd.DataFrame({"file": [key[0]], "means": [list(m)], "weights": [list(w)]})

    return (
        df.select(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("file"),
            F.col(col).cast("double").alias(col),
        )
        .groupBy("file")
        .applyInPandas(kernel, schema=f"file string, {_DIGEST_SCHEMA}")
    )


def quantiles_from_digest_rows(
    rows: Sequence, probs: Sequence[float], compression: int = 200
) -> list[float]:
    """Merge collected digest rows (means/weights columns) and query."""
    m, w = merge_digests(
        [(np.asarray(r["means"]), np.asarray(r["weights"])) for r in rows],
        compression,
    )
    return quantile_from_digest(m, w, probs)
