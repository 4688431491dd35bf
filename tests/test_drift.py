"""KS drift detector (operators/drift.py) against hand-computed cases."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from parquet_rewriter_spark.operators.drift import ks_drift_by_group
from parquet_rewriter_spark.sources.readers import load_table


def _stats(spark, rows):
    df = spark.createDataFrame([Row(g=g, v=v) for g, v in rows])
    out = ks_drift_by_group(df, "v", "g", out_group="g")
    return {r.g: (r.n_group, r.n_rest, r.ks_stat) for r in out.collect()}


def test_identical_distributions_have_zero_drift(spark):
    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)]
    got = _stats(spark, rows)
    assert got["a"] == (3, 3, 0.0)
    assert got["b"] == (3, 3, 0.0)


def test_disjoint_supports_have_maximal_drift(spark):
    rows = [("a", 10), ("a", 11), ("b", 1), ("b", 2)]
    got = _stats(spark, rows)
    assert got["a"][2] == 1.0 and got["b"][2] == 1.0


def test_ties_use_post_step_cdf(spark):
    # A=[1,1,2] vs B=[1,2,2]: distinct v=1 → |2/3 - 1/3| = 1/3; v=2 → 0
    rows = [("a", 1), ("a", 1), ("a", 2), ("b", 1), ("b", 2), ("b", 2)]
    got = _stats(spark, rows)
    assert abs(got["a"][2] - round(1 / 3, 6)) < 1e-9


def test_fixture_statistics_are_valid_probabilities(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    out = ks_drift_by_group(d, "n_chars", "source")
    row = out.agg(
        F.min("ks_stat"), F.max("ks_stat"), F.count(F.lit(1))
    ).first()
    assert 0.0 <= row[0] and row[1] <= 1.0
    assert row[2] == d.select("source").distinct().count()
