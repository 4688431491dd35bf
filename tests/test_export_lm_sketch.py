"""Round-3 tail operators: shard export, bigram LM scoring, decayed
aggregates, HLL distinct index, streaming quality router."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from parquet_rewriter_spark.sources.readers import load_table


# ------------------------------------------------------------- shard export


def _docs_with_tokens(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.size(F.split("text", " ")).alias("n_tok")
    )


def test_assign_shards_matches_window_replay(spark, sf_dir):
    from parquet_rewriter_spark.operators.export import assign_shards

    d = _docs_with_tokens(spark, sf_dir)
    got = assign_shards(d, 8, "n_tok", ["doc_id"]).select("doc_id", "shard")
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n_tok").desc(), "doc_id")
    want = d.select(
        "doc_id", ((F.row_number().over(w) - 1) % 8).cast("int").alias("shard")
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_shards_balanced_within_one_max_doc(spark, sf_dir):
    from parquet_rewriter_spark.operators.export import assign_shards, shard_summary

    d = _docs_with_tokens(spark, sf_dir)
    s = shard_summary(
        assign_shards(d, 8, "n_tok", ["doc_id"]), size_col="n_tok"
    ).collect()
    totals = [r["total_size"] for r in s]
    max_doc = d.agg(F.max("n_tok")).first()[0]
    assert len(s) == 8
    # round-robin in descending size order: spread bounded by one doc
    assert max(totals) - min(totals) <= max_doc


def test_assign_shards_partition_invariant(spark, sf_dir):
    from parquet_rewriter_spark.operators.export import assign_shards

    d = _docs_with_tokens(spark, sf_dir)
    a = assign_shards(d, 4, "n_tok", ["doc_id"]).select("doc_id", "shard")
    b = assign_shards(d.repartition(13), 4, "n_tok", ["doc_id"]).select(
        "doc_id", "shard"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_write_shards_layout(spark, sf_dir):
    from parquet_rewriter_spark.operators.export import assign_shards, write_shards

    d = _docs_with_tokens(spark, sf_dir)
    sharded = assign_shards(d, 4, "n_tok", ["doc_id"])
    out = tempfile.mkdtemp(prefix="prs_test_shards_")
    try:
        write_shards(sharded, out)
        dirs = sorted(x for x in os.listdir(out) if x.startswith("shard="))
        assert dirs == [f"shard={i}" for i in range(4)]
        back = spark.read.parquet(out)
        assert back.count() == d.count()
        assert back.select("doc_id").distinct().count() == d.count()
    finally:
        shutil.rmtree(out, ignore_errors=True)


# ------------------------------------------------------------- bigram LM


def test_lm_scores_prefer_corpus_like_text(spark):
    from parquet_rewriter_spark.functions.lm import score_documents

    rows = [
        (0, "the table scans rows fast " * 10),
        (1, "the table scans rows fast " * 10),
        (2, "zq qx jvw plurf gnath xoxo " * 10),  # gibberish: unseen-elsewhere bigrams
        (3, "one"),  # < 2 tokens → score 0
    ]
    docs = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in score_documents(docs).collect()}
    assert got[3]["n_bigrams"] == 0 and got[3]["avg_logp"] == 0.0
    # repeated common text scores higher (closer to 0) than gibberish
    assert got[0]["avg_logp"] > got[2]["avg_logp"]
    assert got[0]["avg_logp"] == got[1]["avg_logp"]  # identical docs, identical score


def test_lm_bigram_counts(spark):
    from parquet_rewriter_spark.functions.lm import train_bigram_lm

    docs = spark.createDataFrame(
        [(0, "a b a b c")], "doc_id long, text string"
    )
    n12, n1, vocab = train_bigram_lm(docs)
    counts = {(r["w1"], r["w2"]): r["n12"] for r in n12.collect()}
    assert counts == {("a", "b"): 2, ("b", "a"): 1, ("b", "c"): 1}
    ctx = {r["w1"]: r["n1"] for r in n1.collect()}
    assert ctx == {"a": 2, "b": 2}
    assert vocab.first()["v"] == 3


# ------------------------------------------------------------- decayed agg


def test_decayed_agg_halves_per_half_life(spark):
    from parquet_rewriter_spark.operators.timeseries import decayed_agg

    rows = [
        (1, "2024-01-15 00:00:00", 10.0),  # newest: weight 1
        (1, "2024-01-08 00:00:00", 10.0),  # one half-life old: weight 0.5
        (1, "2024-01-01 00:00:00", 10.0),  # two half-lives: weight 0.25
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_s string, value double").select(
        "user_id", F.to_timestamp("ts_s").alias("ts"), "value"
    )
    r = decayed_agg(ev, "user_id", "ts", "value", half_life="7 days").first()
    assert abs(r["decayed_sum"] - 17.5) < 1e-9
    assert abs(r["decayed_weight"] - 1.75) < 1e-9
    assert r["n_events"] == 3 and r["newest_age_s"] == 0.0


# ------------------------------------------------------------- HLL distinct index


def _make_table(spark, sf_dir, name):
    from parquet_rewriter_spark.table import SortedTable

    ev = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix=f"prs_test_{name}_")
    t = SortedTable.create(
        spark, os.path.join(d, "t"), ev, key="event_id", max_records_per_file=150
    )
    return t, ev, d


def test_distinct_index_estimate_within_band(spark, sf_dir):
    from parquet_rewriter_spark.operators.distinct_index import (
        estimate_distinct,
        refresh_distinct_index,
    )

    t, ev, d = _make_table(spark, sf_dir, "dix")
    try:
        added = refresh_distinct_index(t, ["user_id"])
        assert added == len(t.manifest().files)
        est = estimate_distinct(t, "user_id")
        exact = ev.select(F.count_distinct("user_id")).first()[0]
        assert est is not None and abs(est - exact) / exact <= 0.05
        # second refresh: nothing new to sketch
        assert refresh_distinct_index(t, ["user_id"]) == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_distinct_index_refresh_is_churn_proportional(spark, sf_dir):
    from parquet_rewriter_spark.operators.distinct_index import (
        estimate_distinct,
        refresh_distinct_index,
        sketched_files,
    )
    from parquet_rewriter_spark.operators.merge import merge_into_table

    t, ev, d = _make_table(spark, sf_dir, "dix_churn")
    try:
        refresh_distinct_index(t, ["user_id"])
        before = sketched_files(t, "user_id")
        muts = (
            ev.limit(50)
            .withColumn("event_id", F.col("event_id") + F.lit(10_000_000))
            .withColumn("user_id", F.col("user_id") + F.lit(500_000))
        )
        merge_into_table(t, muts)
        live = {e.name for e in t.manifest().files}
        # estimate refuses to answer while new files are unsketched
        assert estimate_distinct(t, "user_id") is None
        added = refresh_distinct_index(t, ["user_id"])
        assert added == len(live - before)  # only the commit's files
        est = estimate_distinct(t, "user_id")
        exact = t.read().select(F.count_distinct("user_id")).first()[0]
        assert est is not None and abs(est - exact) / exact <= 0.05
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_distinct_index_union_equals_whole(spark, sf_dir):
    """Mergeability: union of per-file sketches == one global sketch."""
    from parquet_rewriter_spark.operators.distinct_index import (
        LG_CONFIG_K,
        estimate_distinct,
        refresh_distinct_index,
    )

    t, ev, d = _make_table(spark, sf_dir, "dix_merge")
    try:
        refresh_distinct_index(t, ["user_id"])
        est_union = estimate_distinct(t, "user_id")
        est_whole = (
            ev.agg(
                F.hll_sketch_estimate(
                    F.hll_sketch_agg("user_id", F.lit(LG_CONFIG_K))
                ).alias("e")
            ).first()["e"]
        )
        assert est_union == est_whole
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ------------------------------------------------------------- quality router


def test_stream_quality_route_partitions_rows(spark, sf_dir):
    from parquet_rewriter_spark.streaming.ops import stream_events, stream_quality_route

    base = tempfile.mkdtemp(prefix="prs_test_qroute_")
    clean_dir, quar_dir = os.path.join(base, "c"), os.path.join(base, "q")
    try:
        rules = {
            "value_under_100": "value < 100",
            "type_not_error": "event_type <> 'error'",
        }
        stream_quality_route(
            stream_events(spark, sf_dir), rules, clean_dir, quar_dir,
            os.path.join(base, "ckpt"),
        )
        ev = load_table(spark, sf_dir, "events")
        clean = spark.read.parquet(clean_dir)
        quar = spark.read.parquet(quar_dir)
        assert clean.count() + quar.count() == ev.count()
        want_clean = ev.filter(
            (F.col("value") < 100) & (F.col("event_type") != "error")
        ).count()
        assert clean.count() == want_clean
        # every quarantined row names at least one failed rule, correctly
        bad = quar.filter(
            F.array_contains("_violated_rules", "value_under_100")
            & (F.col("value") < 100)
        ).count()
        assert bad == 0 and quar.filter(F.size("_violated_rules") == 0).count() == 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


# ------------------------------------------------------------- ids regression


def test_contiguous_ids_survive_plan_embedding(spark, sf_dir):
    """Regression: ids must stay correct when the operator's output is
    EMBEDDED as the second child of a set operation. exceptAll/union
    renumber the second child's partitions within the combined stage;
    the old TaskContext-based offset lookup silently mis-assigned every
    id in that context (frozen-pid columns are immune)."""
    from pyspark.sql import Window

    from parquet_rewriter_spark.operators.ids import assign_contiguous_ids

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    got = assign_contiguous_ids(d, ["lang", "doc_id"], id_col="sid")
    w = Window.orderBy("lang", "doc_id")
    want = d.select("doc_id", "lang", (F.row_number().over(w) - 1).alias("sid"))
    # second-child position is the one that breaks stage partition ids
    assert want.exceptAll(got).count() == 0
    assert got.exceptAll(want).count() == 0


# ------------------------------------------------------------- naive bayes


def test_nb_classifier_separates_synthetic_languages(spark):
    from parquet_rewriter_spark.functions.classify import (
        confusion_matrix,
        predict_nb,
        train_nb,
    )

    rows = []
    for i in range(20):
        rows.append((i, "der hund läuft schnell durch den wald " * 3, "de"))
        rows.append((100 + i, "the dog runs quickly through the woods " * 3, "en"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    cm = {(r["lang"], r["pred"]): r["n_docs"] for r in
          confusion_matrix(docs, "doc_id", "text", "lang").collect()}
    assert cm == {("de", "de"): 20, ("en", "en"): 20}  # perfectly separable

    # a fresh doc in one language scores to that language
    lik, priors = train_nb(docs, "text", "lang")
    probe = spark.createDataFrame(
        [(999, "der wald und der hund")], "doc_id long, text string"
    )
    p = predict_nb(probe, lik, priors, "doc_id", "text", "lang").first()
    assert p["pred"] == "de"
