"""MinhashDedupIndex (operators/dedup_index.py): incremental dedup —
signatures computed once per doc, batches checked against the stored
index, mutations through the engine's own merge core."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_rewriter_spark.operators.dedup_index import MinhashDedupIndex


def _corpus(spark, n=60, words=12):
    # deterministic docs with DISJOINT vocab windows (stride > words and
    # no wraparound), so no two corpus docs are accidental near-dups
    vocab = [f"w{i:04d}" for i in range(1000)]
    rows = [
        (i, " ".join(vocab[i * 16 + j] for j in range(words)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dup_batch_found(spark, tmp_path):
    corpus = _corpus(spark)
    idx = MinhashDedupIndex.build(
        spark, str(tmp_path / "idx"), corpus, num_hashes=32, bands=16
    )
    # new batch: copies of docs 3 and 10 under new ids + one fresh doc
    batch = corpus.filter(F.col("doc_id").isin(3, 10)).withColumn(
        "doc_id", F.col("doc_id") + 1000
    )
    fresh = spark.createDataFrame(
        [(2000, "totally novel text " + " ".join(f"z{i}" for i in range(12)))],
        "doc_id long, text string",
    )
    hits = idx.near_dups_of(batch.unionByName(fresh), threshold=0.9)
    got = {(r.batch_id, r.index_id) for r in hits.collect()}
    assert (1003, 3) in got and (1010, 10) in got
    assert not any(b == 2000 for b, _ in got)
    # exact copies agree on every component
    assert all(r.est_jaccard == 1.0 for r in hits.collect() if r.batch_id != 2000)


def test_add_then_redetect(spark, tmp_path):
    corpus = _corpus(spark)
    idx = MinhashDedupIndex.build(
        spark, str(tmp_path / "idx2"), corpus, num_hashes=32, bands=16
    )
    batch = corpus.filter(F.col("doc_id") == 5).withColumn(
        "doc_id", F.col("doc_id") + 500
    )
    stats = idx.add(batch)
    assert stats["rows_rewritten"] >= 1
    # the added doc is now IN the index: a later batch duplicating it hits both
    batch2 = corpus.filter(F.col("doc_id") == 5).withColumn(
        "doc_id", F.col("doc_id") + 900
    )
    got = {(r.batch_id, r.index_id) for r in idx.near_dups_of(batch2, 0.9).collect()}
    assert (905, 5) in got and (905, 505) in got


def test_remove_forgets(spark, tmp_path):
    corpus = _corpus(spark)
    idx = MinhashDedupIndex.build(
        spark, str(tmp_path / "idx3"), corpus, num_hashes=32, bands=16
    )
    idx.remove(spark.createDataFrame([(7,)], "doc_id long"))
    batch = corpus.filter(F.col("doc_id") == 7).withColumn(
        "doc_id", F.col("doc_id") + 700
    )
    assert idx.near_dups_of(batch, 0.5).count() == 0


def test_estimate_tracks_true_jaccard(spark, tmp_path):
    # doc pairs sharing half their shingles should estimate near 0.5
    vocab = [f"w{i:03d}" for i in range(100)]
    base = " ".join(vocab[:40])
    half = " ".join(vocab[20:60])  # 3-gram shingle overlap ≈ 1/3
    corpus = spark.createDataFrame([(1, base)], "doc_id long, text string")
    idx = MinhashDedupIndex.build(
        spark, str(tmp_path / "idx4"), corpus, num_hashes=48, bands=48
    )  # r=1 bands: candidate recall ~1 even at J~0.3, so the test probes the ESTIMATE
    batch = spark.createDataFrame([(2, half)], "doc_id long, text string")
    rows = idx.near_dups_of(batch, threshold=0.05).collect()
    assert len(rows) == 1
    # true 3-shingle jaccard of the two windows: 18 shared / 58 total
    true_j = 18 / 58
    assert abs(rows[0].est_jaccard - true_j) < 0.2  # 48-component sketch band


def test_reopen_from_disk(spark, tmp_path):
    corpus = _corpus(spark)
    MinhashDedupIndex.build(
        spark, str(tmp_path / "idx5"), corpus, num_hashes=32, bands=16
    )
    idx = MinhashDedupIndex.open(
        spark, str(tmp_path / "idx5"), num_hashes=32, bands=16
    )
    batch = corpus.filter(F.col("doc_id") == 0).withColumn("doc_id", F.lit(99).cast("long"))
    got = idx.near_dups_of(batch, 0.9).collect()
    assert {(r.batch_id, r.index_id) for r in got} == {(99, 0)}


def test_portable_family_full_lifecycle(spark, tmp_path):
    """hash_family='portable' (the oracled md5-bridge family) must run
    the same build/add/probe/remove lifecycle as xxhash64, find the
    same exact-copy hits at est 1.0, and reopen from disk under the
    declared family."""
    corpus = _corpus(spark)
    idx = MinhashDedupIndex.build(
        spark, str(tmp_path / "pidx"), corpus, num_hashes=32, bands=16,
        hash_family="portable",
    )
    batch = corpus.filter(F.col("doc_id").isin(5, 17)).withColumn(
        "doc_id", F.col("doc_id") + 1000
    )
    hits = idx.near_dups_of(batch, threshold=0.9).collect()
    assert {(r.batch_id, r.index_id) for r in hits} == {(1005, 5), (1017, 17)}
    assert all(r.est_jaccard == 1.0 for r in hits)
    idx.add(batch)
    idx.remove(spark.createDataFrame([(5,)], "doc_id long"))
    re = MinhashDedupIndex.open(
        spark, str(tmp_path / "pidx"), num_hashes=32, bands=16,
        hash_family="portable",
    )
    hits2 = {(r.batch_id, r.index_id)
             for r in re.near_dups_of(batch, threshold=0.9).collect()}
    # original 5 removed; the added twins now hit each other's entries
    assert (1005, 5) not in hits2
    assert (1017, 17) in hits2 and (1005, 1005) not in hits2


def test_family_validation():
    import pytest

    with pytest.raises(ValueError, match="hash_family"):
        MinhashDedupIndex(None, hash_family="sha9000")
