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


# ------------------------------------------------------------ materializer

def test_materialize_packed_stream_invariants(spark):
    """Every window but a shard's last is exactly M long; the
    concatenation of a shard's windows equals the concatenation of its
    docs' ids in doc order (nothing lost, duplicated, or reordered)."""
    import random

    from pyspark.sql import Row
    from parquet_rewriter_spark.operators.packing import (
        materialize_packed,
        pack_sequences,
    )

    rng = random.Random(7)
    docs, streams = [], {0: [], 1: []}
    for i in range(40):
        ids = [rng.randrange(1000) for _ in range(rng.randrange(0, 23))]
        docs.append(Row(doc_id=i, input_ids=ids))
        streams[i % 2].extend(ids)
    df = spark.createDataFrame(docs, "doc_id long, input_ids array<int>")
    p = pack_sequences(df, "doc_id", F.size("input_ids"), max_tokens=16,
                       shard_col=F.pmod(F.col("doc_id"), F.lit(2)))
    out = materialize_packed(p, "input_ids", 16).collect()
    by_shard = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["seq_id"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for s, rows in by_shard.items():
        for r in rows[:-1]:
            assert r["n_tokens"] == 16  # full windows
        flat = [x for r in rows for x in r["input_ids"]]
        assert flat == streams[s]  # exact stream conservation
        assert [r["seq_id"] for r in rows] == list(range(len(rows)))
        for r in rows:  # boundary metadata consistent with the ids
            assert sum(r["piece_lengths"]) == r["n_tokens"]
            assert len(r["piece_lengths"]) == r["n_pieces"]
            assert all(pl > 0 for pl in r["piece_lengths"])


def test_materialize_packed_splits_docs_across_boundaries(spark):
    from pyspark.sql import Row
    from parquet_rewriter_spark.operators.packing import (
        materialize_packed,
        pack_sequences,
    )

    df = spark.createDataFrame(
        [Row(doc_id=0, input_ids=list(range(10)))], "doc_id long, input_ids array<int>"
    )
    p = pack_sequences(df, "doc_id", F.size("input_ids"), max_tokens=4,
                       shard_col=F.lit(0))
    rows = sorted(materialize_packed(p, "input_ids", 4).collect(),
                  key=lambda r: r["seq_id"])
    assert [list(r["input_ids"]) for r in rows] == [[0,1,2,3],[4,5,6,7],[8,9]]
    assert [r["n_pieces"] for r in rows] == [1, 1, 1]  # one doc, 3 fragments
