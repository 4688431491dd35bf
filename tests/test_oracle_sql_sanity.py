"""Every registered oracle must PARSE and PLAN in DuckDB against the
fixture views — cheap (no Spark, no execution) and catches structural
registry damage instantly (a stray positional arg once displaced three
queries' oracle SQL; this test fails in milliseconds on that class of
bug instead of at the driver gate)."""

from __future__ import annotations

from parquet_rewriter_spark import catalog
from tests.oracle_harness import duck_connection

SF_DIR = "/root/testdata/sf0.001"


def test_every_oracle_parses_and_plans():
    con = duck_connection(SF_DIR)
    bad = []
    for name, sql in catalog.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as ex:  # noqa: BLE001 - collecting all failures
            bad.append((name, f"{type(ex).__name__}: {str(ex)[:120]}"))
    assert not bad, bad


def test_no_oracle_emits_complex_typed_columns():
    """The driver's correctness gate canonicalizes results with
    ``pandas.sort_values``, which CRASHES on list/struct/map cells
    (``TypeError: unhashable type: 'list'`` — the round-8 lesson: two
    BPE queries shipped array<int> outputs and went red at the gate
    while hash-matching locally). Guard: every registered oracle's
    RESULT SCHEMA must be scalar-only. ``DESCRIBE <query>`` is
    plan-time in DuckDB, so this sweeps all ~290 oracles in seconds.
    Array-valued deliverables ship as digests / joined strings (see
    catalog._ids_digest); the array-returning operators remain the
    user API."""
    con = duck_connection(SF_DIR)
    bad = []
    for name, sql in catalog.oracle_sql().items():
        for row in con.execute(f"DESCRIBE {sql}").fetchall():
            col, typ = row[0], row[1]
            t = typ.upper()
            if "[]" in t or "STRUCT" in t or "MAP(" in t or "LIST" in t or "UNION" in t:
                bad.append((name, col, typ))
    assert not bad, bad


def test_every_query_has_name_consistency():
    # a query's registered name must never BE its oracle text (the
    # displaced-positional-arg failure mode), and oracles are queries
    names = set(catalog.queries())
    for name, sql in catalog.oracle_sql().items():
        body = "\n".join(
            ln for ln in sql.splitlines() if not ln.strip().startswith("--")
        )
        head = body.lstrip().split(None, 1)[0].upper()
        assert head in ("SELECT", "WITH"), (name, sql[:40])
        assert sql.strip().strip('"') not in names, name
