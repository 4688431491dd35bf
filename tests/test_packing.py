"""pack_sequences (operators/packing.py): concatenate-and-cut packing
math — offsets tile each shard's token stream exactly, boundary spans
are flagged, and the assignment is deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_rewriter_spark.operators.packing import pack_sequences


def _docs(spark, toks):
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(toks)], "doc_id long, n_tok long"
    )


def test_single_shard_layout(spark):
    # one shard: docs of 100/2000/50/3000 tokens into 1024-token windows
    d = _docs(spark, [100, 2000, 50, 3000])
    out = pack_sequences(
        d, "doc_id", "n_tok", max_tokens=1024, shard_col=F.lit(0)
    ).orderBy("doc_id")
    rows = out.collect()
    # cumulative starts: 0, 100, 2100, 2150
    assert [(r.seq_id, r.seq_offset) for r in rows] == [
        (0, 0),
        (0, 100),
        (2, 52),
        (2, 102),
    ]
    assert [r.spans_boundary for r in rows] == [False, True, False, True]


def test_offsets_reconstruct_stream(spark):
    # seq_id * max + seq_offset must equal the running token count
    d = _docs(spark, [300, 700, 123, 456, 789, 1, 2048, 5000])
    out = pack_sequences(d, "doc_id", "n_tok", max_tokens=2048, shard_col=F.lit(0))
    rows = sorted(out.collect(), key=lambda r: r.doc_id)
    run = 0
    for r in rows:
        assert r.seq_id * 2048 + r.seq_offset == run
        run += r.n_tok


def test_shards_pack_independently(spark):
    d = _docs(spark, [512] * 8)
    out = pack_sequences(
        d, "doc_id", "n_tok", max_tokens=1024, shard_col=F.col("doc_id") % 2
    )
    rows = sorted(out.collect(), key=lambda r: r.doc_id)
    # each shard sees four 512-token docs: offsets 0,512 in seqs 0,1
    for r in rows:
        pos_in_shard = r.doc_id // 2
        assert r.seq_id == pos_in_shard // 2
        assert r.seq_offset == (pos_in_shard % 2) * 512
        assert not r.spans_boundary


def test_default_hash_shard_deterministic(spark):
    d = _docs(spark, [10] * 100)
    a = pack_sequences(d, "doc_id", "n_tok", max_tokens=64, num_shards=4)
    b = pack_sequences(d, "doc_id", "n_tok", max_tokens=64, num_shards=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert a.select("shard").distinct().count() == 4
