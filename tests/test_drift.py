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


def _legacy_ks(df, value_col, group_col, round_digits):
    """The pre-rewrite crossJoin-tag implementation, kept verbatim as
    the bit-identity reference: it pushed G× the corpus through the
    shuffle, but its integers and double divisions define the answer."""
    from pyspark.sql import Window

    groups = df.select(F.col(group_col).alias("__g")).distinct()
    tagged = df.crossJoin(F.broadcast(groups)).select(
        "__g",
        F.col(value_col).alias("__v"),
        (F.col(group_col) == F.col("__g")).cast("int").alias("__in"),
    )
    counts = tagged.repartition(F.col("__g")).groupBy("__g", "__v").agg(
        F.sum("__in").cast("double").alias("__ca"),
        F.sum(1 - F.col("__in")).cast("double").alias("__cb"),
    )
    w_tot = Window.partitionBy("__g")
    w_cum = (
        Window.partitionBy("__g")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cdfs = counts.select(
        "__g",
        (F.sum("__ca").over(w_cum) / F.sum("__ca").over(w_tot)).alias("__fa"),
        (F.sum("__cb").over(w_cum) / F.sum("__cb").over(w_tot)).alias("__fb"),
        F.sum("__ca").over(w_tot).alias("__na"),
        F.sum("__cb").over(w_tot).alias("__nb"),
    )
    return cdfs.groupBy("__g").agg(
        F.max("__na").cast("long").alias("n_group"),
        F.max("__nb").cast("long").alias("n_rest"),
        F.round(F.max(F.abs(F.col("__fa") - F.col("__fb"))), round_digits)
        .alias("ks_stat"),
    ).withColumnRenamed("__g", "g")


def test_rewrite_is_bit_identical_to_legacy_plan(spark, sf_dir):
    """The subtraction plan (counts once, rest = total − group) must
    reproduce the crossJoin-tag plan's statistics EXACTLY — same
    integers in, same double divisions, down to the last bit (checked
    at 12 digits, far past any KS use case)."""
    d = load_table(spark, sf_dir, "documents")
    new = ks_drift_by_group(d, "n_chars", "source", out_group="g",
                            round_digits=12)
    old = _legacy_ks(d, "n_chars", "source", round_digits=12)
    key = lambda r: r["g"]
    got = [(r["g"], r["n_group"], r["n_rest"], r["ks_stat"])
           for r in sorted(new.collect(), key=key)]
    want = [(r["g"], r["n_group"], r["n_rest"], r["ks_stat"])
            for r in sorted(old.collect(), key=key)]
    assert got == want


def test_psi_matches_hand_computation(spark):
    """a=[1,1,2] vs b=[1,2,2], 10 bins over [1,2]: v=1 → bin 0,
    v=2 → bin 9 (clamped). PSI_a = (2/3−1/3)ln(2) + (1/3−2/3)ln(1/2)
    = (2/3)ln 2 — symmetric for b."""
    import math

    from parquet_rewriter_spark.operators.drift import psi_drift_by_group

    rows = [("a", 1), ("a", 1), ("a", 2), ("b", 1), ("b", 2), ("b", 2)]
    df = spark.createDataFrame(rows, "g string, v int")
    out = psi_drift_by_group(df, "v", "g", out_group="g")
    got = {r.g: (r.n_group, r.n_rest, r.psi) for r in out.collect()}
    want = round((2 / 3) * math.log(2), 6)
    assert got["a"] == (3, 3, want)
    assert got["b"] == (3, 3, want)


def test_psi_zero_identical_large_disjoint(spark):
    from parquet_rewriter_spark.operators.drift import psi_drift_by_group

    ident = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)]
    out = psi_drift_by_group(
        spark.createDataFrame(ident, "g string, v int"), "v", "g", out_group="g"
    )
    assert all(r.psi == 0.0 for r in out.collect())
    # disjoint supports: each side's mass sits where the other has only
    # the 1e-6 floor — PSI blows up far past the 0.25 "major shift" bar
    disj = [("a", 10), ("a", 11), ("b", 1), ("b", 2)]
    out2 = psi_drift_by_group(
        spark.createDataFrame(disj, "g string, v int"), "v", "g", out_group="g"
    )
    assert all(r.psi > 5 for r in out2.collect())


def test_w1_matches_hand_computation(spark):
    """a=[0,0,10] vs b=[0,10,10]: distinct values (0,10); at v=0,
    F_a=2/3, F_b=1/3 → |gap|·(10−0) = (1/3)·10; the last value has no
    successor (both CDFs are 1 there). W₁ = 10/3. Also: disjoint
    supports shifted by D have W₁ ≈ D while KS saturates at 1."""
    from parquet_rewriter_spark.operators.drift import w1_drift_by_group

    rows = [("a", 0), ("a", 0), ("a", 10), ("b", 0), ("b", 10), ("b", 10)]
    df = spark.createDataFrame(rows, "g string, v int")
    got = {r.g: (r.n_group, r.n_rest, r.w1)
           for r in w1_drift_by_group(df, "v", "g", out_group="g").collect()}
    want = (3, 3, round(10 / 3, 6))
    assert got["a"] == want and got["b"] == want

    far = [("a", 0), ("a", 1), ("b", 100), ("b", 101)]
    out = w1_drift_by_group(
        spark.createDataFrame(far, "g string, v int"), "v", "g", out_group="g"
    )
    vals = {r.g: r.w1 for r in out.collect()}
    assert all(99 <= v <= 101 for v in vals.values())  # distance, not just 1.0


def test_chi2_matches_hand_computation(spark):
    """a=[1,1,2] vs b=[1,2,2]: t_v = (3,3), n_a = n_b = 3, every
    expected cell = 3·3/6 = 1.5, so X² = 4·(0.5²/1.5) = 2/3; dof = 1."""
    from parquet_rewriter_spark.operators.drift import chi2_drift_by_group

    rows = [("a", 1), ("a", 1), ("a", 2), ("b", 1), ("b", 2), ("b", 2)]
    df = spark.createDataFrame(rows, "g string, v int")
    out = chi2_drift_by_group(df, "v", "g", out_group="g")
    got = {r.g: (r.n_group, r.n_rest, r.dof, r.chi2) for r in out.collect()}
    want = (3, 3, 1, round(2 / 3, 4))
    assert got["a"] == want and got["b"] == want


def test_chi2_zero_for_identical_mix(spark):
    from parquet_rewriter_spark.operators.drift import chi2_drift_by_group

    rows = [(g, v) for g in ("a", "b", "c") for v in ("x", "y", "y")]
    df = spark.createDataFrame(rows, "g string, v string")
    out = chi2_drift_by_group(df, "v", "g", out_group="g")
    assert all(r.chi2 == 0.0 and r.dof == 1 for r in out.collect())


def test_null_groups_count_as_rest_only(spark):
    """Rows with a NULL group value are corpus reality (a source tag
    missing). They must count toward every group's complement ("rest")
    without crashing the per-value map (null map keys are illegal in
    Spark) and without earning an output row of their own."""
    rows = [("a", 1), ("a", 2), ("b", 1), ("b", 3), (None, 2), (None, 3)]
    df = spark.createDataFrame(rows, "g string, v int")
    out = ks_drift_by_group(df, "v", "g", out_group="g")
    got = {r.g: (r.n_group, r.n_rest) for r in out.collect()}
    assert set(got) == {"a", "b"}  # no null-group row
    assert got["a"] == (2, 4)  # rest includes b's 2 AND the 2 null rows
    assert got["b"] == (2, 4)


def test_fixture_statistics_are_valid_probabilities(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    out = ks_drift_by_group(d, "n_chars", "source")
    row = out.agg(
        F.min("ks_stat"), F.max("ks_stat"), F.count(F.lit(1))
    ).first()
    assert 0.0 <= row[0] and row[1] <= 1.0
    assert row[2] == d.select("source").distinct().count()


def test_max_distinct_guard_fires_with_actionable_message(spark, sf_dir):
    """A near-unique continuous column would funnel |V| ≈ n rows
    through the one unpartitioned group-list window; the plan itself
    must refuse (assert_true riding __gs) and point at quantize=."""
    import pytest

    d = load_table(spark, sf_dir, "documents").select(
        "source",
        (F.col("n_chars").cast("double")
         + (F.col("doc_id") % 997) / 997.0).alias("score"),
    )
    with pytest.raises(Exception, match="quantize"):
        ks_drift_by_group(d, "score", "source", max_distinct=50).collect()


def test_quantize_bounds_the_distinct_relation(spark, sf_dir):
    """quantize= makes the same near-unique column computable under a
    tight max_distinct, stays a 1-FileScan plan, and the binned KS
    approximates the exact statistic (sup-gap error ≤ bin mass)."""
    from parquet_rewriter_spark.operators.drift import (
        psi_drift_by_group,
        w1_drift_by_group,
    )
    from parquet_rewriter_spark.plans import plan_of

    d = load_table(spark, sf_dir, "documents").select(
        "source",
        (F.col("n_chars").cast("double")
         + (F.col("doc_id") % 997) / 997.0).alias("score"),
    )
    exact = {r["source"]: r["ks_stat"]
             for r in ks_drift_by_group(d, "score", "source").collect()}
    q = ks_drift_by_group(d, "score", "source", quantize=64, max_distinct=100)
    p = plan_of(q, "simple")
    assert p.count("FileScan") == 1, p  # range pass was eager, not in-plan
    got = {r["source"]: r["ks_stat"] for r in q.collect()}
    assert set(got) == set(exact)
    assert all(abs(got[s] - exact[s]) < 0.1 for s in got), (got, exact)
    # W1 quantization uses bin CENTERS: stays in value units
    w_exact = {r["source"]: r["w1"]
               for r in w1_drift_by_group(d, "score", "source").collect()}
    w_q = {r["source"]: r["w1"]
           for r in w1_drift_by_group(
               d, "score", "source", quantize=64, max_distinct=100
           ).collect()}
    span = d.agg(F.max("score") - F.min("score")).first()[0]
    assert all(abs(w_q[s] - w_exact[s]) < span * 0.05 for s in w_q)
    # PSI composes: pre-binned input under the guard still computes
    psi = psi_drift_by_group(
        d, "score", "source", quantize=64, max_distinct=100
    )
    assert psi.count() == len(exact)


def test_quantize_noop_cases(spark):
    """Constant and all-NULL columns skip quantization (no range), and
    a low-cardinality column quantizes to itself-shaped results."""
    from parquet_rewriter_spark.operators.drift import _quantized

    const = spark.createDataFrame([Row(g="a", v=5.0), Row(g="b", v=5.0)])
    df2, col2 = _quantized(const, "v", 8)
    assert col2 == "v"  # unchanged: nothing to quantize
    nulls = spark.createDataFrame(
        [Row(g="a", v=None), Row(g="b", v=None)], "g string, v double"
    )
    df3, col3 = _quantized(nulls, "v", 8)
    assert col3 == "v"
    # NULLs stay NULL through quantization when the range is real
    mixed = spark.createDataFrame(
        [Row(g="a", v=0.0), Row(g="a", v=None), Row(g="b", v=10.0)],
        "g string, v double",
    )
    df4, col4 = _quantized(mixed, "v", 4)
    vals = [r[col4] for r in df4.select(col4).collect()]
    assert sum(v is None for v in vals) == 1


def test_quantile_edges_exact_order_statistics(spark, sf_dir):
    """Equal-frequency edges: hand-checkable small case (10 values,
    quartiles), duplicate-rank collapse on skew, NULL exclusion, and
    the |V| guard."""
    import pytest

    from parquet_rewriter_spark.operators.drift import quantile_edges

    df = spark.createDataFrame(
        [Row(v=float(x)) for x in (1, 2, 3, 4, 5, 6, 7, 8, 9, 10)]
        + [Row(v=None)],
        "v double",
    )
    # quartile ranks 2.5, 5, 7.5 → smallest v with cum >= rank
    assert quantile_edges(df, "v", 4) == [3.0, 5.0, 8.0]
    # a heavy value straddles several ranks → edges collapse
    skew = spark.createDataFrame(
        [Row(v=1.0)] * 9 + [Row(v=2.0)], "v double"
    )
    assert quantile_edges(skew, "v", 4) == [1.0]
    # guard: near-unique column under a tight bound refuses
    d = load_table(spark, sf_dir, "documents").select(
        (F.col("n_chars") + (F.col("doc_id") % 997) / 997.0).alias("s")
    )
    with pytest.raises(Exception, match="quantize|distinct"):
        quantile_edges(d, "s", 10, max_distinct=50)
    with pytest.raises(ValueError, match="at least 2"):
        quantile_edges(df, "v", 1)
