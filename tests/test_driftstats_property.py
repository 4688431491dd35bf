"""Property-based drift-sidecar correctness (hypothesis): for
arbitrary (group, value) populations — NULL groups and NULL values
included — the from-stats statistics computed from per-file count
matrices must equal a straight-line python replay of the same
definitions, and PSI must agree with the equal-width scan path when
the declared edges reproduce its binning. Each example builds a real
table (matrices ride the real builder), so examples are capped but the
shrinker still minimizes failures."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from parquet_rewriter_spark.operators.driftstats import (
    build_drift_stats,
    ks_from_stats,
    psi_from_stats,
)
from parquet_rewriter_spark.table import SortedTable

EDGES = [5, 15, 25]

# populations: small so table builds stay fast; values span all bins
# plus out-of-range and NULL; groups include NULL
rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", None]),
        st.one_of(st.none(), st.integers(min_value=-3, max_value=40)),
    ),
    min_size=4,
    max_size=80,
)


def _replay(pop, edges, floor_p=1e-6):
    n_bins = len(edges) + 2
    tot = [0] * n_bins
    per_g: dict[str, list[int]] = {}
    for g, v in pop:
        b = 0 if v is None else 1 + sum(1 for e in edges if v > e)
        tot[b] += 1
        if g is not None:
            per_g.setdefault(g, [0] * n_bins)[b] += 1
    psi_out, ks_out = {}, {}
    for g, ca in per_g.items():
        cb = [t - c for t, c in zip(tot, ca)]
        na, nb = float(sum(ca)), float(sum(cb))
        # PSI policy: an empty side is all-floor (finite), like the
        # scan path's greatest(NULL-from-0/0, floor)
        psi = 0.0
        for c, d in zip(ca, cb):
            pa = max(c / na, floor_p) if na > 0 else floor_p
            pb = max(d / nb, floor_p) if nb > 0 else floor_p
            psi += (pa - pb) * math.log(pa / pb)
        psi_out[g] = (int(na), int(nb), round(psi, 6))
        # KS policy: an empty (non-NULL) side → undefined → None
        ca_o, cb_o = ca[1:], cb[1:]
        na_o, nb_o = float(sum(ca_o)), float(sum(cb_o))
        if na_o == 0 or nb_o == 0:
            ks_out[g] = (int(na_o), int(nb_o), None)
            continue
        d = cum_a = cum_b = 0.0
        for c_a, c_b in zip(ca_o, cb_o):
            cum_a += c_a
            cum_b += c_b
            d = max(d, abs(cum_a / na_o - cum_b / nb_o))
        ks_out[g] = (int(na_o), int(nb_o), round(d, 6))
    return psi_out, ks_out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pop=rows_strategy)
def test_from_stats_match_replay_on_arbitrary_populations(
    spark, tmp_path_factory, pop
):
    tmp = tmp_path_factory.mktemp("driftprop")
    df = spark.createDataFrame(
        [Row(k=i, g=g, v=v) for i, (g, v) in enumerate(pop)],
        "k long, g string, v int",
    )
    t = SortedTable.create(
        spark, str(tmp / "t"), df, key="k", max_records_per_file=7
    )
    build_drift_stats(t, "v", "g", EDGES)
    want_psi, want_ks = _replay(pop, EDGES)
    got_psi = {r["g"]: (r["n_group"], r["n_rest"], r["psi"])
               for r in psi_from_stats(t, "v", "g", EDGES).collect()}
    got_ks = {r["g"]: (r["n_group"], r["n_rest"], r["ks_stat"])
              for r in ks_from_stats(t, "v", "g", EDGES).collect()}
    assert got_psi == want_psi
    assert got_ks == want_ks
