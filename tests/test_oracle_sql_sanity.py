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
