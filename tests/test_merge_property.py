"""Property-based merge correctness (hypothesis): arbitrary mutation
sets against arbitrary base key sets must satisfy the reference's
set-reconciliation contract — the generalized form of its randomized
tests (ParquetRewriterTests.java:246-341).

Spark-session churn makes per-example table builds expensive, so the
strategy generates the *shape* (key universe, mutation mix) and each
example replays through the same session; examples are capped but the
shrinker still minimizes failures.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_merge import _mk_table, _mutations_df, _validate
from parquet_rewriter_spark.operators import merge_into_table

# key universe deliberately includes negatives and gaps; mutations may
# hit head/tail/gaps/existing keys or be no-op deletes of absent keys
keysets = st.sets(st.integers(min_value=-50, max_value=250), min_size=1, max_size=120)
upsert_keys = st.sets(st.integers(min_value=-60, max_value=260), max_size=40)
delete_keys = st.sets(st.integers(min_value=-60, max_value=260), max_size=40)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(base_keys=keysets, ups=upsert_keys, dels=delete_keys)
def test_merge_reconciles_arbitrary_mutation_sets(
    spark, tmp_path_factory, base_keys, ups, dels
):
    tmp = tmp_path_factory.mktemp("prop")
    t, base = _mk_table(spark, tmp, sorted(base_keys), max_records_per_file=16)
    # an UPSERT and DELETE of the same key in one batch is ambiguous in a
    # set model (the reference's ordered stream disambiguates by order);
    # our contract: ops within a batch are disjoint by key
    dels = dels - ups
    upserts = {k: bytes([k % 251, 1, 2]) for k in ups}
    merge_into_table(t, _mutations_df(spark, upserts, dels))
    _validate(t, base, upserts, dels)


ops_seq = st.lists(
    st.one_of(
        st.tuples(st.just("merge"),
                  st.sets(st.integers(min_value=-60, max_value=260), max_size=20),
                  st.sets(st.integers(min_value=-60, max_value=260), max_size=20)),
        st.tuples(st.just("rename"), st.just(None), st.just(None)),
        st.tuples(st.just("compact"), st.just(None), st.just(None)),
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(base_keys=keysets, seq=ops_seq)
def test_interleaved_rename_merge_compact_reconcile(
    spark, tmp_path_factory, base_keys, seq
):
    """Arbitrary interleavings of merge / RENAME COLUMN / compact must
    keep the set-reconciliation contract, with mutations always
    addressed through the CURRENT logical column names."""
    from parquet_rewriter_spark.operators.compact import compact
    from pyspark.sql import Row

    tmp = tmp_path_factory.mktemp("prop_rn")
    t, model = _mk_table(spark, tmp, sorted(base_keys), max_records_per_file=16)
    names = ["key", "value"]  # current logical names

    for i, (op, ups, dels) in enumerate(seq):
        if op == "rename":
            new_names = [f"{n}_r{i}" for n in names]
            t.rename_column(names[0], new_names[0])
            t.rename_column(names[1], new_names[1])
            names = new_names
        elif op == "compact":
            compact(t, max_records_per_file=32)
        else:
            dels = dels - ups
            upserts = {k: bytes([k % 251, i % 256, 7]) for k in ups}
            rows = [Row(**{names[0]: int(k), names[1]: v, "op": "UPSERT"})
                    for k, v in upserts.items()]
            rows += [Row(**{names[0]: int(k), names[1]: None, "op": "DELETE"})
                     for k in sorted(dels)]
            muts = spark.createDataFrame(
                rows, schema=f"{names[0]} long, {names[1]} binary, op string"
            )
            merge_into_table(t, muts)
            for k in dels:
                model.pop(k, None)
            model.update(upserts)

    got = {r[names[0]]: bytes(r[names[1]]) for r in t.read().collect()}
    assert got == model
    assert t.read().columns == names
