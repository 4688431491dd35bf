"""Round-12 additions: frozen-tokenizer token accounting, ADVICE-r11
hardening (empty-aggregate scalars, CUSUM grid on non-finite/huge
values, train/encode flag stamps, span doc-type preservation,
unbiased byte-gate sampling)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


# --------------------------- frozen-tokenizer token accounting


def _seed_table(spark, tmp_path, docs):
    from parquet_rewriter_spark.table import SortedTable

    return SortedTable.create(
        spark, str(tmp_path / "t"), docs, key="doc_id",
        max_records_per_file=max(1, docs.count() // 4),
    )


def test_token_stats_tokenizer_unit_matches_frozen_encode(spark, tmp_path):
    """The sidecar's frozen-token totals must equal summing the frozen
    encoder's own per-doc n_tokens — the unit the mixture planner
    budgets."""
    from parquet_rewriter_spark.operators.bpe import (
        bpe_train,
        encode_docs_with_rules,
        rules_df,
    )
    from parquet_rewriter_spark.operators.tokenstats import (
        TokenizerRef,
        build_token_stats,
        token_stats,
    )

    d = (
        spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .select("doc_id", "source", "text")
        .limit(120)
    )
    rules, vocab = bpe_train(d, "text", n_merges=4)
    rp = str(tmp_path / "rules")
    rules_df(spark, rules).write.parquet(rp)
    ref = TokenizerRef(rp)

    t = _seed_table(spark, tmp_path, d)
    built = build_token_stats(t, tokenizer=ref)
    assert built == len(t.manifest().files)

    got = {
        r["source"]: (int(r["n_docs"]), int(r["n_tokens"]))
        for r in token_stats(t, tokenizer=ref).collect()
    }
    enc = encode_docs_with_rules(d, "doc_id", "text", rules, vocab, unk_id=-1)
    want = {
        r["source"]: (int(r["n_docs"]), int(r["n_tokens"]))
        for r in enc.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .collect()
    }
    vocab.unpersist()
    assert got == want


def test_token_stats_tokenizer_spec_heals_via_maintenance(spark, tmp_path):
    """A tokenizer accounting is SELF-DESCRIBING: after a merge with
    no explicit build call, heal_token_stats reloads the frozen rules
    from the spec-embedded artifact path and rebuilds only the
    churned files."""
    from parquet_rewriter_spark.operators.bpe import bpe_train, rules_df
    from parquet_rewriter_spark.operators.merge import merge_into_table
    from parquet_rewriter_spark.operators.tokenstats import (
        TokenizerRef,
        build_token_stats,
        heal_token_stats,
        token_stats,
    )

    d = (
        spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .select("doc_id", "source", "text")
        .limit(120)
    )
    rules, vocab = bpe_train(d, "text", n_merges=3)
    vocab.unpersist()
    rp = str(tmp_path / "rules")
    rules_df(spark, rules).write.parquet(rp)
    ref = TokenizerRef(rp)

    seed = d.filter((F.col("doc_id") < 40) | (F.col("doc_id") >= 60))
    t = _seed_table(spark, tmp_path, seed)
    build_token_stats(t, tokenizer=ref)
    full_before = {
        r["source"]: int(r["n_tokens"])
        for r in token_stats(t, tokenizer=ref).collect()
    }

    muts = d.filter(
        (F.col("doc_id") >= 40) & (F.col("doc_id") < 60)
    ).withColumn("op", F.lit("UPSERT"))
    merge_into_table(t, muts, allow_splice=False)
    built = heal_token_stats(t)  # no explicit build_token_stats call
    assert 0 < built < len(t.manifest().files)

    # healed totals cover the whole table now — strictly more tokens
    full_after = {
        r["source"]: int(r["n_tokens"])
        for r in token_stats(t, tokenizer=ref).collect()
    }
    assert sum(full_after.values()) > sum(full_before.values())

    # and a fresh one-table build over the union reproduces them
    t2 = _seed_table(spark, tmp_path / "fresh", d)
    build_token_stats(t2, tokenizer=ref)
    fresh = {
        r["source"]: int(r["n_tokens"])
        for r in token_stats(t2, tokenizer=ref).collect()
    }
    assert full_after == fresh


def test_tokenizer_ref_rejects_pipe_in_path():
    from parquet_rewriter_spark.operators.tokenstats import TokenizerRef

    with pytest.raises(ValueError):
        TokenizerRef("/tmp/a|b")


def test_token_spec_roundtrip():
    from parquet_rewriter_spark.operators.tokenstats import (
        TokenizerRef,
        _parse_spec,
        _spec_id,
    )

    ref = TokenizerRef("/tmp/x/rules", pretokenize=True, byte_level=True)
    sid = _spec_id("source", "text", True, ref)
    ps, pt_col, pretok, tok = _parse_spec(sid)
    assert (ps, pt_col, pretok) == ("source", "text", True)
    assert tok == ref
    # word-unit specs parse back with no tokenizer
    sid2 = _spec_id("source", "text", False)
    assert _parse_spec(sid2) == ("source", "text", False, None)


# --------------------------- ADVICE r11: train/encode flag stamps


def test_encode_refuses_flag_mismatch(spark):
    from parquet_rewriter_spark.operators.bpe import (
        bpe_train,
        encode_docs,
        encode_docs_with_rules,
        fertility_by,
    )

    d = spark.createDataFrame(
        [(0, "hello world", "a"), (1, "Hello, world!", "b")],
        "doc_id long, text string, lang string",
    )
    rules, vocab = bpe_train(d, "text", n_merges=2, pretokenize=True)
    try:
        with pytest.raises(ValueError, match="pretokenize"):
            encode_docs(d, "doc_id", "text", vocab)  # default False
        with pytest.raises(ValueError, match="pretokenize"):
            fertility_by(d, "text", "lang", vocab)
        with pytest.raises(ValueError, match="byte_level"):
            encode_docs_with_rules(
                d, "doc_id", "text", rules, vocab,
                pretokenize=True, byte_level=True,  # trained char-level
            )
        # matching flags pass
        assert (
            encode_docs(d, "doc_id", "text", vocab, pretokenize=True).count()
            == 2
        )
    finally:
        vocab.unpersist()


def test_encode_unstamped_vocab_falls_back_to_contract(spark, tmp_path):
    """A vocab reloaded from storage has no stamp — the documented
    caller contract applies, no assertion fires."""
    from parquet_rewriter_spark.operators.bpe import bpe_train, encode_docs

    d = spark.createDataFrame(
        [(0, "hello world"), (1, "world hello hello")],
        "doc_id long, text string",
    )
    rules, vocab = bpe_train(d, "text", n_merges=2)
    p = str(tmp_path / "vocab")
    vocab.select("word", "cnt", "sym").write.parquet(p)
    vocab.unpersist()
    stored = spark.read.parquet(p)
    assert encode_docs(d, "doc_id", "text", stored).count() == 2


# --------------------------- ADVICE r11: CUSUM grid hardening


def test_cusum_grid_survives_nonfinite_and_huge_values():
    """The streaming CUSUM grid must propagate NaN/±Inf (as Spark's
    F.round does) and quantize huge magnitudes without
    InvalidOperation — one bad sensor value must not kill the
    micro-batch."""
    import math
    from decimal import ROUND_HALF_UP, Decimal, localcontext

    R = 2
    quantum = Decimal(1).scaleb(-R)

    def r_grid(x: float) -> float:
        if not math.isfinite(x):
            return x
        with localcontext() as ctx:
            ctx.prec = 400
            return float(
                Decimal(repr(x)).quantize(quantum, rounding=ROUND_HALF_UP)
            )

    assert r_grid(2.675) == 2.68  # HALF_UP at the binary midpoint
    assert math.isnan(r_grid(float("nan")))
    assert r_grid(float("inf")) == float("inf")
    assert r_grid(float("-inf")) == float("-inf")
    assert r_grid(1e300) == 1e300
    assert r_grid(-1.7976931348623157e308) == -1.7976931348623157e308


# --------------------------- ADVICE r11: span doc-type preservation


def test_doc_spans_keep_string_doc_ids(spark):
    """materialize_packed(doc_col=...) must keep the doc column's
    original type — a uuid/string doc id must survive into doc_spans
    instead of silently becoming NULL."""
    from parquet_rewriter_spark.operators.packing import (
        materialize_packed,
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [("u-1", 0, [1, 2, 3]), ("u-2", 1, [4, 5]), ("u-3", 2, [6])],
        "doc string, ord long, input_ids array<int>",
    )
    p = pack_sequences(
        docs, "ord", F.size("input_ids"), max_tokens=4,
        shard_col=F.lit(0),
    )
    win = materialize_packed(p, "input_ids", 4, doc_col="doc")
    spans = [
        s for r in win.orderBy("seq_id").collect() for s in r["doc_spans"]
    ]
    assert all(s["doc"] is not None for s in spans)
    assert {s["doc"] for s in spans} == {"u-1", "u-2", "u-3"}


# --------------------------- ADVICE r11: unbiased byte-gate sample


def test_relation_bytes_hash_mod_sample_is_layout_unbiased(spark):
    """Estimate on a width-skewed relation (width correlates with the
    sort/partition order): the hash-mod sample must land within 2× of
    the true total where a LIMIT-prefix sample would see only narrow
    rows (~10× under)."""
    from parquet_rewriter_spark.operators.bpe import _relation_bytes

    n = 200_000
    # first half: 1-char payloads; second half: ~100-char payloads —
    # a LIMIT sample reading early partitions sees only narrow rows
    rel = (
        spark.range(n)
        .select(
            F.col("id").alias("word"),
            F.when(F.col("id") < n // 2, F.lit("x"))
            .otherwise(F.lpad(F.lit(""), 100, "y"))
            .alias("payload"),
        )
        .sortWithinPartitions("word")
    )
    true_bytes = rel.select(
        F.sum(
            F.length(F.to_json(F.struct(F.col("word"), F.col("payload"))))
        )
    ).first()[0]
    est = _relation_bytes(rel, n)
    assert true_bytes / 2 <= est <= true_bytes * 2
