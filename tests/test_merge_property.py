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
