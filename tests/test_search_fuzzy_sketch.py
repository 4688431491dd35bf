"""Round-3 operator batch: BM25 search, fuzzy join, weighted sampling,
Space-Saving heavy hitters, PQ ANN, SCD2 history.

Oracle parity for the oracled queries is covered by
tests/oracle_harness.py; these tests pin the operator-level contracts
that parity alone doesn't: lossless blocking vs brute force, sketch
guarantees, sampling bias, PQ recall, interval tiling.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

SF_DIR = "/root/testdata/sf0.01"


# ----------------------------------------------------------------- BM25

def test_bm25_ranks_term_density(spark):
    from parquet_rewriter_spark.operators.search import bm25_topk

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spark spark spark"),
            Row(doc_id=2, text="spark row row row row row row row row row"),
            Row(doc_id=3, text="row row row"),
        ]
    )
    out = bm25_topk(docs, "doc_id", "text", ["spark"], k=3).collect()
    # only docs containing the term appear; the term-dense short doc wins
    assert [r["doc_id"] for r in out] == [1, 2]
    assert out[0]["score"] > out[1]["score"] > 0


def test_bm25_no_corpus_cross_join(spark):
    from parquet_rewriter_spark.operators.search import bm25_topk
    from parquet_rewriter_spark.sources.readers import load_table

    d = load_table(spark, SF_DIR, "documents")
    plan = bm25_topk(d, "doc_id", "text", ["join", "scan"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


# ----------------------------------------------------------- fuzzy join

def _brute_pairs(spark, rows, d):
    a = spark.createDataFrame(rows)
    l = a.selectExpr("id as id_a", "s as s_a")
    r = a.selectExpr("id as id_b", "s as s_b")
    return {
        (x["id_a"], x["id_b"])
        for x in l.crossJoin(r)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.levenshtein("s_a", "s_b") <= d)
        .collect()
    }


@pytest.mark.parametrize("max_dist", [1, 2])
def test_fuzzy_join_equals_bruteforce(spark, max_dist):
    from parquet_rewriter_spark.operators.fuzzy import fuzzy_self_join

    rows = [
        Row(id=1, s="kitten"), Row(id=2, s="sitten"), Row(id=3, s="kitte"),
        Row(id=4, s="mitten"), Row(id=5, s="banana"), Row(id=6, s="bananas"),
        Row(id=7, s="ab"), Row(id=8, s="ac"), Row(id=9, s="b"),  # short block
        Row(id=10, s="abcd"), Row(id=11, s="abc"),  # cross-block edges
        Row(id=12, s="completely different string"),
    ]
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_self_join(
            spark.createDataFrame(rows), "id", "s", max_dist=max_dist, q=2
        ).collect()
    }
    assert got == _brute_pairs(spark, rows, max_dist)


def test_fuzzy_join_no_cartesian_on_long_strings(spark):
    from parquet_rewriter_spark.operators.fuzzy import fuzzy_self_join

    rows = [Row(id=i, s=f"longish-string-number-{i}") for i in range(30)]
    df = fuzzy_self_join(spark.createDataFrame(rows), "id", "s", max_dist=1, q=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # all strings are long → short/cross blocks are empty; the candidate
    # join must be the q-gram equi-join, never a cartesian product
    assert "CartesianProduct" not in plan
    assert df.count() == 0 or all(r["edit_dist"] <= 1 for r in df.collect())


# ------------------------------------------------------ weighted sample

def test_weighted_sample_deterministic_and_biased(spark):
    from parquet_rewriter_spark.operators.sampling import weighted_sample

    rows = [Row(k=i, w=(100.0 if i % 2 else 1.0)) for i in range(1000)]
    df = spark.createDataFrame(rows)
    s1 = [r["k"] for r in weighted_sample(df, "k", "w", k=100).collect()]
    s2 = [r["k"] for r in weighted_sample(df.repartition(13), "k", "w", k=100).collect()]
    assert s1 == s2  # identical selection regardless of partitioning
    heavy = sum(1 for k in s1 if k % 2)
    assert heavy > 80  # 100:1 weights → heavy class dominates
    assert len(s1) == len(set(s1)) == 100  # without replacement, exact k


def test_weighted_sample_excludes_nonpositive(spark):
    from parquet_rewriter_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame([Row(k=1, w=0.0), Row(k=2, w=-3.0), Row(k=3, w=1.0)])
    assert [r["k"] for r in weighted_sample(df, "k", "w", k=10).collect()] == [3]


# -------------------------------------------------------- heavy hitters

def test_space_saving_candidates_cover_exact_topk(spark):
    from parquet_rewriter_spark.operators.sketch import (
        heavy_hitters_topk, space_saving_summary,
    )

    # Zipf-ish synthetic stream: item i appears ~N/i times
    rows = [Row(item=f"w{i}") for i in range(1, 60) for _ in range(600 // i)]
    df = spark.createDataFrame(rows).repartition(8)
    exact = (
        df.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("item")).limit(10).collect()
    )
    got = heavy_hitters_topk(df, "item", k=10, capacity=64).collect()
    assert [(r["item"], r["n_occurrences"]) for r in got] == [
        (r["item"], r["n"]) for r in exact
    ]
    # summary bounds: count-err <= true <= count for every surviving item
    true = {r["item"]: r["n"] for r in df.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()}
    for r in space_saving_summary(df, "item", capacity=64).collect():
        assert r["count"] - r["err"] <= true[r["item"]] <= r["count"]


def test_space_saving_bounded_state(spark):
    from parquet_rewriter_spark.operators.sketch import space_saving_summary

    rows = [Row(item=f"u{i}") for i in range(5000)]  # flat universe
    summ = space_saving_summary(spark.createDataFrame(rows).repartition(4), "item", capacity=32)
    # per-partition summaries are capacity-bounded → merged size <= 4*32
    assert summ.count() <= 128


# ---------------------------------------------------------------- PQ ANN

def test_pq_recall_and_code_shape(spark):
    from parquet_rewriter_spark.operators.similarity import (
        ann_pq_topk, cosine_topk, pq_encode, pq_train_codebooks,
    )
    from parquet_rewriter_spark.sources.readers import load_table

    e = load_table(spark, SF_DIR, "embeddings")
    qv = [float(x) for x in e.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    exact = {r["id"] for r in cosine_topk(e, "vec_id", "embedding", qv, k=10).collect()}
    approx = {
        r["id"]
        for r in ann_pq_topk(e, "vec_id", "embedding", qv, k=10, m=8, n_codes=64, rerank=100).collect()
    }
    assert len(exact & approx) / 10 >= 0.6

    dim = len(e.select("embedding").first()[0])
    books = pq_train_codebooks(e, "embedding", m=8, n_codes=16)
    assert books.shape == (8, 16, dim // 8)
    codes = pq_encode(e, "embedding", books).select("pq_code").first()[0]
    assert len(codes) == 8 and all(0 <= c < 16 for c in codes)


def test_pq_rerank_improves_on_raw_pq(spark):
    from parquet_rewriter_spark.operators.similarity import ann_pq_topk, cosine_topk
    from parquet_rewriter_spark.sources.readers import load_table

    e = load_table(spark, SF_DIR, "embeddings")
    qv = [float(x) for x in e.filter(F.col("vec_id") == 7).select("embedding").first()[0]]
    exact = {r["id"] for r in cosine_topk(e, "vec_id", "embedding", qv, k=10).collect()}
    raw = {r["id"] for r in ann_pq_topk(e, "vec_id", "embedding", qv, k=10, m=8, n_codes=64, rerank=0).collect()}
    rr = {r["id"] for r in ann_pq_topk(e, "vec_id", "embedding", qv, k=10, m=8, n_codes=64, rerank=100).collect()}
    assert len(rr & exact) >= len(raw & exact)


# ------------------------------------------------------------------ SCD2

def test_scd2_intervals_tile(spark):
    from parquet_rewriter_spark import catalog

    out = catalog.get("scd2_customer_status_history").fn(spark, SF_DIR).collect()
    by_cust: dict = {}
    for r in out:
        by_cust.setdefault(r["custkey"], []).append(r)
    for cust, rows in by_cust.items():
        rows.sort(key=lambda r: r["valid_from"])
        # exactly one open interval per customer, and it is the last
        currents = [r for r in rows if r["is_current"]]
        assert len(currents) == 1 and rows[-1]["is_current"]
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"]  # intervals tile
            assert a["status"] != b["status"]  # runs are compressed
