"""Count-Min sketch (operators/countmin.py) contracts: one-sided error,
the CM error bound, mergeability, and the bounded-size build plan."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from parquet_rewriter_spark.operators.countmin import (
    countmin_build,
    countmin_lookup,
    countmin_merge,
    portable_string_hash,
)
from parquet_rewriter_spark.plans import plan_of
from parquet_rewriter_spark.sources.readers import load_table

DEPTH, WIDTH = 4, 512


def _tokens(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select(F.explode(F.split("text", " ")).alias("t")).filter(
        F.col("t") != ""
    )


def test_estimates_never_undercount_any_item(spark, sf_dir):
    tok = _tokens(spark, sf_dir)
    sketch = countmin_build(tok, "t", DEPTH, WIDTH)
    exact = tok.groupBy("t").agg(F.count(F.lit(1)).alias("exact_n"))
    est = countmin_lookup(sketch, exact, "t", DEPTH, WIDTH)
    n_under = est.filter(F.col("est") < F.col("exact_n")).count()
    assert n_under == 0


def test_overcount_within_cm_bound(spark, sf_dir):
    """ε = e/width with δ = e^-depth; check the εN bound on the top
    tokens with 8× slack (the bound is per-query probabilistic, but at
    depth 4 a miss on every one of 20 probes would be astronomical)."""
    tok = _tokens(spark, sf_dir)
    n_total = tok.count()
    sketch = countmin_build(tok, "t", DEPTH, WIDTH)
    probes = (
        tok.groupBy("t").agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "t").limit(20)
    )
    est = countmin_lookup(sketch, probes, "t", DEPTH, WIDTH)
    worst = est.agg(F.max(F.col("est") - F.col("exact_n"))).first()[0]
    assert worst <= 8 * math.e / WIDTH * n_total + 1


def test_merge_equals_whole_corpus_sketch(spark, sf_dir):
    """Counter-wise mergeability: sketch(A ∪ B) == merge(sketch(A),
    sketch(B)) cell for cell."""
    tok = _tokens(spark, sf_dir).withColumn(
        "half", portable_string_hash("t") % 2
    )
    a = countmin_build(tok.filter(F.col("half") == 0), "t", DEPTH, WIDTH)
    b = countmin_build(tok.filter(F.col("half") == 1), "t", DEPTH, WIDTH)
    merged = countmin_merge(a, b)
    whole = countmin_build(tok, "t", DEPTH, WIDTH)
    diff = (
        merged.withColumnRenamed("cnt", "m")
        .join(whole.withColumnRenamed("cnt", "w"), ["j", "bucket"], "full")
        .filter(
            F.abs(F.coalesce("m", F.lit(0.0)) - F.coalesce("w", F.lit(0.0)))
            > 1e-9
        )
    )
    assert diff.count() == 0


def test_weighted_build_sums_weights(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    sketch = countmin_build(d, "lang", DEPTH, WIDTH, weight_col="n_chars")
    probes = d.groupBy("lang").agg(F.sum("n_chars").cast("double").alias("w"))
    est = countmin_lookup(sketch, probes, "lang", DEPTH, WIDTH)
    # few distinct langs, 512 buckets: collisions essentially impossible,
    # so the estimate should be EXACTLY the weighted sum
    bad = est.filter(F.abs(F.col("est") - F.col("w")) > 1e-6).count()
    assert bad == 0


def test_build_is_one_shuffle_of_sketch_size(spark, sf_dir):
    """The build must shuffle only the (j, bucket) cells — one hash
    exchange — and the result relation is capped at depth·width rows."""
    tok = _tokens(spark, sf_dir)
    sketch = countmin_build(tok, "t", DEPTH, WIDTH)
    p = plan_of(sketch)
    assert p.count("Arguments: hashpartitioning") == 1, p
    assert sketch.count() <= DEPTH * WIDTH


def test_inner_product_upper_bounds_join_size(spark, sf_dir):
    """CMS inner product >= true equi-join size, for self-join (F2) and
    for a two-relation join; estimates are deterministic."""
    from parquet_rewriter_spark.operators.countmin import (
        countmin_build,
        countmin_inner_product,
    )

    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "click").select("user_id")
    sa, sb = countmin_build(a, "user_id"), countmin_build(b, "user_id")
    est = countmin_inner_product(sa, sb).first()["est"]
    exact = a.join(b, "user_id").count()
    assert est >= exact > 0
    # F2 self-join
    s = countmin_build(ev.select("user_id"), "user_id")
    est2 = countmin_inner_product(s, s).first()["est"]
    f2 = (
        ev.groupBy("user_id").count()
        .agg(F.sum(F.col("count") * F.col("count"))).first()[0]
    )
    assert est2 >= f2 > 0
    assert countmin_inner_product(s, s).first()["est"] == est2
