"""Round-9 operators: BPE decode/round-trip, streaming packing."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Row

from parquet_rewriter_spark.sources.readers import load_table


def test_bpe_decode_roundtrips_exactly(spark, sf_dir):
    """decode(encode(t)) must reproduce encode's normalization of t for
    EVERY document — the oracle hash-match proves engines agree; this
    pins the stronger claim that the id stream is lossless."""
    from parquet_rewriter_spark.operators.bpe import (
        bpe_train,
        decode_docs,
        encode_docs,
    )

    d = load_table(spark, sf_dir, "documents")
    rules, vocab = bpe_train(d, "text", n_merges=3)
    enc = encode_docs(d, "doc_id", "text", vocab)
    dec = decode_docs(enc, "input_ids", vocab)
    norm = d.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != ""),
        ).alias("expect"),
    )
    j = dec.join(norm, "doc_id")
    n_docs = j.count()
    n_exact = j.filter(F.col("decoded") == F.col("expect")).count()
    vocab.unpersist()
    assert n_docs > 0 and n_exact == n_docs


def test_bpe_decode_is_pure_codegen_no_shuffle(spark):
    """Decode adds ZERO exchanges and zero Python to the encoded
    relation: the bounded symbol table is a map literal, the lookup a
    codegen transform."""
    from parquet_rewriter_spark.operators.bpe import (
        bpe_train,
        decode_docs,
    )
    from parquet_rewriter_spark.plans.inspect import plan_of

    docs = spark.createDataFrame(
        [Row(doc_id=0, text="low lower lowest"), Row(doc_id=1, text="new newer")]
    )
    rules, vocab = bpe_train(docs, "text", n_merges=2)
    enc = spark.createDataFrame([Row(doc_id=0, input_ids=[0, 1, 2])])
    p = plan_of(decode_docs(enc, "input_ids", vocab))
    vocab.unpersist()
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_bpe_decode_hand_example(spark):
    from parquet_rewriter_spark.operators.bpe import (
        bpe_train,
        decode_docs,
        encode_docs,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=0, text="Ab ab  AB"), Row(doc_id=1, text="ba")]
    )
    rules, vocab = bpe_train(docs, "text", n_merges=1)
    enc = encode_docs(docs, "doc_id", "text", vocab)
    got = {
        r["doc_id"]: r["decoded"]
        for r in decode_docs(enc, "input_ids", vocab).collect()
    }
    vocab.unpersist()
    # encode normalizes: lowercase, single-space separation
    assert got == {0: "ab ab ab", 1: "ba"}
