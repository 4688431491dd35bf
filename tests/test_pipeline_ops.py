"""Unit tests for the pipeline-operator batch: sessionization,
deterministic splits/sampling, table diff, profiling, TF-IDF.
(The catalog queries built on these are additionally DuckDB-oracled
by tests/oracle_harness.py / the driver gate.)"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row, functions as F

from parquet_rewriter_spark.operators.diff import diff_summary, table_diff
from parquet_rewriter_spark.operators.profile import profile_numeric
from parquet_rewriter_spark.operators.sampling import (
    hash_split,
    portable_unit,
    stratified_sample,
    unit_interval,
)
from parquet_rewriter_spark.operators.sessionize import session_stats, sessionize


def _ts(minute: float) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=minute)


# ------------------------------------------------------------- sessionize


def test_sessionize_gap_boundaries(spark):
    # gaps: 10m (same), 30m exactly (same — strictly-greater starts new),
    # 31m (new), then a second user interleaved
    rows = [
        Row(u=1, ts=_ts(0)),
        Row(u=1, ts=_ts(10)),
        Row(u=1, ts=_ts(40)),   # 30m gap — NOT a new session (> only)
        Row(u=1, ts=_ts(71)),   # 31m gap — new session
        Row(u=2, ts=_ts(5)),
        Row(u=2, ts=_ts(500)),
    ]
    df = spark.createDataFrame(rows)
    got = {
        (r.u, r.ts.minute + r.ts.hour * 60): r.session_idx
        for r in sessionize(df, "u", "ts", gap_minutes=30).collect()
    }
    assert got == {(1, 0): 0, (1, 10): 0, (1, 40): 0, (1, 71): 1,
                   (2, 5): 0, (2, 500): 1}


def test_session_stats_rollup(spark):
    rows = [Row(u=1, ts=_ts(0)), Row(u=1, ts=_ts(10)), Row(u=1, ts=_ts(100))]
    s = {r.session_idx: r for r in session_stats(
        spark.createDataFrame(rows), "u", "ts", 30).collect()}
    assert s[0].n_events == 2 and s[0].duration_s == 600.0
    assert s[1].n_events == 1 and s[1].duration_s == 0.0


# ---------------------------------------------------------------- sampling


def test_hash_split_deterministic_and_proportional(spark):
    df = spark.range(20_000).withColumnRenamed("id", "k")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = hash_split(df, "k", w).groupBy("split").count().collect()
    counts = {r.split: r["count"] for r in a}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 20_000 - 0.8) < 0.02
    assert abs(counts["val"] / 20_000 - 0.1) < 0.02
    # deterministic: a second run assigns the identical rows
    s1 = hash_split(df, "k", w).filter("split = 'val'").agg(F.sum("k")).first()[0]
    s2 = hash_split(df, "k", w).filter("split = 'val'").agg(F.sum("k")).first()[0]
    assert s1 == s2
    # non-portable family also lands in [0,1) and splits fully
    n = (
        hash_split(df, "k", w, portable=False)
        .groupBy("split").count().count()
    )
    assert n == 3


def test_hash_split_rejects_bad_weights(spark):
    df = spark.range(10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(df, "k", {"a": 0.5, "b": 0.4})


def test_unit_hashes_in_range(spark):
    df = spark.range(1_000).withColumnRenamed("id", "k")
    row = df.select(
        F.min(portable_unit("k")).alias("pmin"), F.max(portable_unit("k")).alias("pmax"),
        F.min(unit_interval("k")).alias("xmin"), F.max(unit_interval("k")).alias("xmax"),
    ).first()
    assert 0.0 <= row.pmin and row.pmax < 1.0
    assert 0.0 <= row.xmin and row.xmax < 1.0


def test_stratified_sample_exact_fraction(spark):
    rows = [Row(g="a", k=i) for i in range(100)] + [Row(g="b", k=i) for i in range(37)]
    df = spark.createDataFrame(rows)
    got = (
        stratified_sample(df, ["g"], 0.1, "k")
        .groupBy("g").count().collect()
    )
    counts = {r.g: r["count"] for r in got}
    assert counts == {"a": 10, "b": 4}  # ceil(37 * 0.1) = 4


def test_negative_samples_deterministic_and_rejecting(spark):
    from parquet_rewriter_spark.operators.sampling import negative_samples

    n = 200
    items = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("grp_item")
    )
    anchors = items.filter(F.col("k") % 10 == 0).select(
        "k", F.col("grp_item").alias("grp")
    )
    out = negative_samples(
        anchors,
        items,
        "k",
        n,
        k=3,
        reject=F.col("grp_item") == F.col("grp"),
    ).select("k", "neg_rank", "neg_id", "grp", "grp_item")
    rows = out.collect()
    # never the anchor itself, never the rejected group, ranks 1..3
    for r in rows:
        assert r.neg_id != r.k
        assert r.grp_item != r.grp
        assert 1 <= r.neg_rank <= 3
    # deterministic: a second run draws the identical pair list
    again = negative_samples(
        anchors, items, "k", n, k=3,
        reject=F.col("grp_item") == F.col("grp"),
    ).select("k", "neg_rank", "neg_id", "grp", "grp_item")
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))
    # full k for every anchor (reject rate 1/4, 9 candidates)
    per_anchor = out.groupBy("k").count().collect()
    assert all(r["count"] == 3 for r in per_anchor)


# -------------------------------------------------------------------- diff


def test_table_diff_classifies_incl_nulls(spark):
    left = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v=None), Row(k=4, v="d")]
    )
    right = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="CHANGED"), Row(k=3, v=None), Row(k=5, v="e")]
    )
    got = {r.k: r.diff_status for r in table_diff(left, right, "k").collect()}
    # null == null → unchanged; k=4 removed; k=5 added
    assert got == {1: "unchanged", 2: "changed", 3: "unchanged",
                   4: "removed", 5: "added"}
    summ = {r.diff_status: r.n_keys for r in diff_summary(left, right, "k").collect()}
    assert summ == {"unchanged": 2, "changed": 1, "removed": 1, "added": 1}


def test_table_diff_null_to_value_is_changed(spark):
    left = spark.createDataFrame([Row(k=1, v=None)], "k long, v string")
    right = spark.createDataFrame([Row(k=1, v="x")], "k long, v string")
    assert table_diff(left, right, "k").first().diff_status == "changed"


def test_table_diff_schema_mismatch(spark):
    left = spark.createDataFrame([Row(k=1, v="a")])
    right = spark.createDataFrame([Row(k=1, w="a")])
    with pytest.raises(ValueError, match="identical schemas"):
        table_diff(left, right, "k")


# ----------------------------------------------------------------- profile


def test_profile_numeric_exact(spark):
    df = spark.createDataFrame(
        [Row(x=1.0), Row(x=2.0), Row(x=None), Row(x=2.0)], "x double"
    )
    got = {
        (r["column"], r.metric): r.value
        for r in profile_numeric(df, ["x"], exact_distinct=True).collect()
    }
    assert got[("x", "n_rows")] == 4.0
    assert got[("x", "n_null")] == 1.0
    assert got[("x", "n_distinct")] == 2.0  # NULL excluded, like SQL
    assert got[("x", "min")] == 1.0 and got[("x", "max")] == 2.0
    assert got[("x", "mean")] == pytest.approx(5.0 / 3, abs=1e-4)


def test_profile_single_job(spark):
    # the whole profile is ONE aggregate: exactly one non-empty stage
    # tree with a single Aggregate pair — assert no per-column jobs by
    # checking the plan contains one HashAggregate chain
    df = spark.range(100).select(
        F.col("id").cast("double").alias("a"), (F.col("id") * 2).cast("double").alias("b")
    )
    plan = profile_numeric(df, ["a", "b"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") <= 2  # partial + final, once


# ------------------------------------------------------------------ tfidf


def test_tfidf_top_terms_small_corpus(spark):
    from parquet_rewriter_spark.functions.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="apple apple banana"),
            Row(doc_id=2, text="banana cherry"),
            Row(doc_id=3, text="cherry cherry cherry durian"),
        ]
    )
    got = tfidf_top_terms(docs, "doc_id", "text", k=1).collect()
    top = {r.doc_id: r.term for r in got}
    # doc1: apple tf=2 df=1 dominates; doc2: banana and cherry tie
    # (tf=1, df=2 each) — alphabetical tiebreak picks banana; doc3:
    # cherry tf=3 df=2 (3·ln1.5≈1.216) beats durian df=1 (ln3≈1.099)
    assert top == {1: "apple", 2: "banana", 3: "cherry"}
    assert all(r.rk == 1 for r in got)


def test_enforce_constraints_split_and_tagging(spark):
    import pyspark.sql.functions as F

    from parquet_rewriter_spark.operators.quality import (
        check_constraints,
        enforce_constraints,
    )

    df = spark.createDataFrame(
        [
            (1, 10.0, "O"),
            (2, -5.0, "O"),      # breaks positive
            (3, 20.0, "X"),      # breaks domain
            (4, None, "F"),      # NULL predicate → violation (unknown ≠ pass)
            (5, -1.0, "Z"),      # breaks both
        ],
        "id long, price double, status string",
    )
    rules = {"positive": "price > 0", "domain": "status IN ('O','F','P')"}

    rep = {r["rule"]: r["n_violations"] for r in check_constraints(df, rules).collect()}
    assert rep == {"positive": 3, "domain": 2}

    clean, bad = enforce_constraints(df, rules)
    assert {r["id"] for r in clean.collect()} == {1}
    tags = {r["id"]: sorted(r["_violated_rules"]) for r in bad.collect()}
    assert tags == {
        2: ["positive"],
        3: ["domain"],
        4: ["positive"],
        5: ["domain", "positive"],
    }
    # clean side keeps the original schema exactly
    assert clean.columns == df.columns


def test_mixture_sample_budgets_and_determinism(spark):
    from parquet_rewriter_spark.operators.sampling import mixture_sample

    rows = [(i, "a" if i < 50 else "b", 10) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = mixture_sample(
        df, "source", "n_chars", {"a": 95.0, "b": 1000.0}, key="doc_id"
    )
    got = out.collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    # a: exclusive-cum < 95 → 10 docs (cum_before of 10th pick is 90);
    # b: budget exceeds the source → taken whole
    assert len(by_src["a"]) == 10
    assert len(by_src["b"]) == 50
    # deterministic under repartitioning
    again = mixture_sample(
        df.repartition(7), "source", "n_chars", {"a": 95.0, "b": 1000.0}, key="doc_id"
    ).collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in got}
    # unknown sources contribute nothing
    none = mixture_sample(df, "source", "n_chars", {"zzz": 100.0}, key="doc_id")
    assert none.count() == 0


def test_webdataset_shards_roundtrip(spark, sf_dir, tmp_path):
    """Tar-shard export: every doc lands in exactly one shard as a
    (.txt payload, .json metadata) member pair; payload bytes round-trip;
    the report is deterministic and byte counts match the corpus."""
    import json
    import os
    import tarfile

    from parquet_rewriter_spark.operators.export import write_webdataset_shards
    from parquet_rewriter_spark.sources.readers import load_table

    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()
    out = str(tmp_path / "wds")
    rep = {
        r["shard"]: r
        for r in write_webdataset_shards(
            d, out, "doc_id", "text", "txt",
            meta_cols=("lang", "source"), n_shards=4,
        ).collect()
    }
    assert sum(r["n_samples"] for r in rep.values()) == n_docs
    total_bytes = d.select(
        F.sum(F.octet_length("text").cast("long"))
    ).first()[0]
    assert sum(r["payload_bytes"] for r in rep.values()) == total_bytes

    seen, meta_ok = set(), 0
    texts = {r["doc_id"]: r["text"] for r in d.select("doc_id", "text").collect()}
    langs = {r["doc_id"]: r["lang"] for r in d.select("doc_id", "lang").collect()}
    for sh, r in rep.items():
        path = os.path.join(out, f"shard-{sh:05d}.tar")
        assert r["path"] == path and os.path.exists(path)
        with tarfile.open(path) as tf:
            members = tf.getmembers()
            assert len(members) == 2 * r["n_samples"]
            for m in members:
                key, ext = m.name.rsplit(".", 1)
                if ext == "txt":
                    assert int(key) not in seen
                    seen.add(int(key))
                    got = tf.extractfile(m).read().decode("utf-8")
                    assert got == texts[int(key)]
                else:
                    meta = json.loads(tf.extractfile(m).read())
                    assert meta["lang"] == langs[int(key)]
                    meta_ok += 1
    assert seen == set(texts) and meta_ok == n_docs

    # deterministic: a second export reports identical assignment
    rep2 = {
        r["shard"]: (r["n_samples"], r["payload_bytes"])
        for r in write_webdataset_shards(
            d, str(tmp_path / "wds2"), "doc_id", "text", "txt",
            meta_cols=("lang", "source"), n_shards=4,
        ).collect()
    }
    assert rep2 == {s: (r["n_samples"], r["payload_bytes"]) for s, r in rep.items()}


def test_webdataset_read_roundtrip(spark, sf_dir, tmp_path):
    """read_webdataset inverts the export: every (key, payload, meta)
    comes back byte-identical, with one task per shard archive."""
    import json

    from parquet_rewriter_spark.operators.export import (
        read_webdataset,
        write_webdataset_shards,
    )
    from parquet_rewriter_spark.sources.readers import load_table

    d = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "wds_rt")
    write_webdataset_shards(
        d, out, "doc_id", "text", "txt",
        meta_cols=("lang",), n_shards=3,
    ).collect()

    back = read_webdataset(spark, out + "/shard-*.tar")
    rows = back.collect()
    assert len(rows) == d.count()
    texts = {r["doc_id"]: r["text"] for r in d.select("doc_id", "text").collect()}
    langs = {r["doc_id"]: r["lang"] for r in d.select("doc_id", "lang").collect()}
    shards = set()
    for r in rows:
        k = int(r["key"])
        assert bytes(r["payload"]).decode("utf-8") == texts[k]
        assert json.loads(r["meta"])["lang"] == langs[k]
        shards.add(r["shard_path"])
    assert len(shards) == 3
