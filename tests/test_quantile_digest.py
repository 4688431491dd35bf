"""t-digest quantile sketch: rank-error bounds, mergeability, grouped
and per-file forms. operators/quantile_digest.py."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from parquet_rewriter_spark.operators.quantile_digest import (
    approx_quantiles,
    column_digest,
    digest_of,
    file_digests,
    grouped_quantiles,
    merge_digests,
    quantile_from_digest,
    quantiles_from_digest_rows,
)

PROBS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def rank_error(values: np.ndarray, estimate: float, p: float) -> float:
    return abs((values <= estimate).mean() - p)


@pytest.mark.parametrize("dist", ["uniform", "lognormal", "bimodal"])
def test_local_digest_rank_error(dist):
    rng = np.random.default_rng(7)
    v = {
        "uniform": rng.uniform(0, 1, 200_000),
        "lognormal": rng.lognormal(0, 2, 200_000),
        "bimodal": np.concatenate(
            [rng.normal(0, 1, 100_000), rng.normal(50, 0.1, 100_000)]
        ),
    }[dist]
    m, w = digest_of(v, compression=200)
    assert len(m) <= 2 * 200  # size bound independent of n
    for p, est in zip(PROBS, quantile_from_digest(m, w, PROBS)):
        assert rank_error(v, est, p) < 0.01, (dist, p)


def test_merge_equals_whole_within_tolerance():
    rng = np.random.default_rng(11)
    a, b, c = (rng.lognormal(0, 1.5, 60_000) for _ in range(3))
    merged = merge_digests([digest_of(a), digest_of(b), digest_of(c)])
    union = np.concatenate([a, b, c])
    for p, est in zip(PROBS, quantile_from_digest(*merged, PROBS)):
        assert rank_error(union, est, p) < 0.015, p


def test_spark_approx_quantiles_vs_exact(spark, sf_dir):
    from parquet_rewriter_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    est = approx_quantiles(li, "l_extendedprice", PROBS)
    exact = np.sort(np.array([r[0] for r in li.select("l_extendedprice").collect()]))
    n = len(exact)
    for p, e in zip(PROBS, est):
        assert abs((exact <= e).mean() - p) < 0.015, p


def test_grouped_quantiles(spark, sf_dir):
    from parquet_rewriter_spark.sources.readers import load_table

    o = load_table(spark, sf_dir, "orders")
    got = {
        r["o_orderstatus"]: (r["q_0_5"], r["q_0_9"])
        for r in grouped_quantiles(
            o, ["o_orderstatus"], "o_totalprice", [0.5, 0.9]
        ).collect()
    }
    for status, (q50, q90) in got.items():
        vals = np.array(
            [
                r[0]
                for r in o.filter(F.col("o_orderstatus") == status)
                .select("o_totalprice")
                .collect()
            ]
        )
        assert rank_error(vals, q50, 0.5) < 0.02
        assert rank_error(vals, q90, 0.9) < 0.02
        assert q50 < q90


def test_file_digests_answer_subset_queries(spark, tmp_path, sf_dir):
    """The sidecar form: per-file digests, then quantiles of a file
    SUBSET from the digests alone — validated against a rescan."""
    from parquet_rewriter_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    src = str(tmp_path / "fd")
    li.repartition(4).write.parquet(src)
    df = spark.read.parquet(src)
    rows = file_digests(df, "l_extendedprice").collect()
    assert len(rows) == 4

    subset = sorted(r["file"] for r in rows)[:2]
    est = quantiles_from_digest_rows(
        [r for r in rows if r["file"] in subset], [0.5, 0.9]
    )
    vals = np.array(
        [
            r[0]
            for r in spark.read.parquet(*[f"{src}/{f}" for f in subset])
            .select("l_extendedprice")
            .collect()
        ]
    )
    assert rank_error(vals, est[0], 0.5) < 0.02
    assert rank_error(vals, est[1], 0.9) < 0.02


def test_digest_handles_empty_and_nan(spark):
    m, w = digest_of(np.array([np.nan, np.nan]))
    assert len(m) == 0
    assert np.isnan(quantile_from_digest(m, w, [0.5])[0])
    df = spark.range(0).select(F.col("id").cast("double").alias("x"))
    assert np.isnan(approx_quantiles(df, "x", [0.5])[0])
