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


def test_write_jsonl_shards_roundtrip_and_layout(spark, sf_dir, tmp_path):
    """JSONL shard export: shard=K dirs exist, every row survives a
    read-back, and within-shard order follows order_cols."""
    import os

    from pyspark.sql import functions as F

    from parquet_rewriter_spark.operators.export import (
        assign_shards,
        write_jsonl_shards,
    )
    from parquet_rewriter_spark.sources.readers import load_table

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.size(F.split("text", " ")).alias("n_tok")
    )
    sharded = assign_shards(d, n_shards=4, size_col="n_tok", tiebreak_cols=["doc_id"])
    out = str(tmp_path / "jsonl")
    write_jsonl_shards(sharded, out, order_cols=("doc_id",))
    dirs = sorted(x for x in os.listdir(out) if x.startswith("shard="))
    assert dirs == [f"shard={i}" for i in range(4)]
    back = spark.read.json(out)
    assert back.count() == d.count()
    assert set(back.columns) >= {"doc_id", "text", "n_tok"}
    # within-shard order: read one shard's file lines directly
    sd = os.path.join(out, "shard=0")
    files = [f for f in os.listdir(sd) if f.endswith(".json")]
    import json as _json

    ids = []
    for f in sorted(files):
        with open(os.path.join(sd, f)) as fh:
            ids += [_json.loads(line)["doc_id"] for line in fh if line.strip()]
    assert ids == sorted(ids)
