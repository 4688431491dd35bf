"""Property-based round-12 invariants (hypothesis): the incremental
packed-shard append and the SFT loss-mask algebra must hold for
ARBITRARY corpus shapes — doc lengths, split points, window sizes,
prompt lengths — not just the unit-test fixtures. Per-example Spark
jobs are expensive (append builds a SortedTable on disk), so examples
are capped (the test_round11_property discipline)."""

from __future__ import annotations

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

doc_lens = st.lists(
    st.integers(min_value=1, max_value=19), min_size=2, max_size=24
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lens=doc_lens,
    m=st.integers(min_value=3, max_value=13),
    shards=st.integers(min_value=1, max_value=3),
    split=st.floats(min_value=0.1, max_value=0.9),
)
def test_append_packed_equals_one_shot_for_arbitrary_shapes(
    spark, lens, m, shards, split
):
    """persist(prefix) + append(suffix with continued offsets) must
    equal the one-shot pack of the whole corpus for ANY doc-length
    profile, window size, shard count, and split point — including
    splits that land mid-window, at exact window boundaries, and
    splits where some shard receives no increment docs."""
    from parquet_rewriter_spark.operators.packing import (
        append_packed,
        materialize_packed,
        pack_sequences,
        persist_packed,
        shard_next_offsets,
    )

    rows = [
        (i, [100 * i + j for j in range(ln)]) for i, ln in enumerate(lens)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, input_ids array<int>")
    shard = F.pmod(F.col("doc_id"), F.lit(shards))
    cut = max(1, int(len(lens) * split))
    a = docs.filter(F.col("doc_id") < cut)
    b = docs.filter(F.col("doc_id") >= cut)

    def win_of(df, offs=None):
        p = pack_sequences(
            df, "doc_id", F.size("input_ids"), m, shard_col=shard,
            start_offsets=offs,
        )
        return materialize_packed(p, "input_ids", m, doc_col="doc_id")

    with tempfile.TemporaryDirectory(prefix="prop_append_") as base:
        t = persist_packed(win_of(a), base + "/t", max_records_per_file=3)
        if b.count():
            offs = shard_next_offsets(
                a, "doc_id", F.size("input_ids"), shard_col=shard
            )
            append_packed(t, win_of(b, offs))
        got = {
            (r["shard"], r["seq_id"]): (
                list(r["input_ids"]),
                [(s["doc"], s["start"], s["len"], s["doc_off"])
                 for s in r["doc_spans"]],
            )
            for r in t.read().collect()
        }
    want = {
        (r["shard"], r["seq_id"]): (
            list(r["input_ids"]),
            [(s["doc"], s["start"], s["len"], s["doc_off"])
             for s in r["doc_spans"]],
        )
        for r in win_of(docs).collect()
    }
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lens=doc_lens,
    m=st.integers(min_value=3, max_value=13),
    data=st.data(),
)
def test_loss_spans_select_exactly_the_completions(spark, lens, m, data):
    """For arbitrary docs and prompt lengths: the tokens selected by
    loss_spans across all windows are EXACTLY the concatenation of
    every doc's completion tokens — no prompt token ever contributes
    to the loss, no completion token is ever dropped, even when the
    prompt/completion boundary and the window boundaries interleave
    arbitrarily."""
    from parquet_rewriter_spark.operators.packing import (
        completion_loss_spans,
        materialize_packed,
        pack_sequences,
    )

    plens = [
        data.draw(st.integers(min_value=0, max_value=ln)) for ln in lens
    ]
    rows = [
        (i, [100 * i + j for j in range(ln)], p)
        for i, (ln, p) in enumerate(zip(lens, plens))
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, input_ids array<int>, prompt_len long"
    ).withColumn("docref", F.struct("doc_id", "prompt_len"))
    p = pack_sequences(
        docs, "doc_id", F.size("input_ids"), m,
        shard_col=F.pmod(F.col("doc_id"), F.lit(2)),
    )
    win = completion_loss_spans(
        materialize_packed(p, "input_ids", m, doc_col="docref")
    )
    got: list[int] = []
    for r in win.collect():
        ids = list(r["input_ids"])
        picked = []
        for s in r["loss_spans"]:
            picked.extend(ids[s["start"] : s["start"] + s["len"]])
        assert len(picked) == int(r["n_loss_tokens"])
        got.extend(picked)
    want = [
        100 * i + j
        for i, (ln, p_) in enumerate(zip(lens, plens))
        for j in range(p_, ln)
    ]
    assert sorted(got) == sorted(want)
