"""Local replica of the driver's correctness gate: run each catalog
query on Spark AND its oracle SQL on DuckDB over the same parquet, then
compare row count, column names, and order-insensitive values.

Usable as a pytest module (test_all_queries_match_oracle) and as a
script: ``python tests/oracle_harness.py [sf_dir] [query ...]``.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(v):
    """Canonicalize a cell for cross-engine comparison.

    Floats are TYPE-TAGGED so an integer-typed 123 never equals a
    float-typed 123.0 — the driver's value hash distinguishes them (the
    round-2 lesson: DuckDB ``sum(BIGINT)`` returns HUGEINT, which lands
    in pandas as float64 and hash-mismatches a Spark long even when
    every value is numerically identical).
    """
    import numpy as np

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, (bool, np.bool_)):
        return bool(v)
    if isinstance(v, (float, np.floating)):
        return ("f", round(float(v), 6))
    if isinstance(v, (int, np.integer)):
        return int(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def compare_query(spark, con, name: str, fn, sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    sdf = fn(spark, sf_dir)
    # pandas on BOTH sides, like the driver: a Spark nullable-int column
    # becomes float64 in pandas exactly as DuckDB's does, so the
    # type-tagged float canon stays symmetric.
    spdf = sdf.toPandas()
    scols = list(spdf.columns)
    ddf = con.execute(sql).fetchdf()
    dcols = list(ddf.columns)
    problems = []
    if sorted(scols) != sorted(dcols):
        problems.append(f"columns differ: spark={sorted(scols)} duckdb={sorted(dcols)}")
        return problems
    if len(spdf) != len(ddf):
        problems.append(f"row count: spark={len(spdf)} duckdb={len(ddf)}")
    cols = sorted(scols)
    srecs = spdf.to_dict("records")
    sset = sorted(
        (tuple(_canon(r[c]) for c in cols) for r in srecs),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )
    drecs = ddf.to_dict("records")
    dset = sorted(
        (tuple(_canon(r[c]) for c in cols) for r in drecs),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )
    if sset != dset and not problems:
        for i, (a, b) in enumerate(zip(sset, dset)):
            if a != b:
                problems.append(f"first value mismatch at sorted-row {i}: spark={a} duckdb={b} cols={cols}")
                break
        else:
            problems.append("value multiset differs (length mismatch tail)")
    return problems


def run_all(spark, sf_dir: str, only: list[str] | None = None) -> dict[str, list[str]]:
    from parquet_rewriter_spark import catalog

    con = duck_connection(sf_dir)
    results = {}
    for name, spec in catalog.REGISTRY.items():
        if only and name not in only:
            continue
        if spec.oracle is None:
            continue
        try:
            results[name] = compare_query(spark, con, name, spec.fn, spec.oracle, sf_dir)
        except Exception as e:  # noqa: BLE001
            results[name] = [f"EXCEPTION: {type(e).__name__}: {e}"]
    return results


def test_all_queries_match_oracle(spark, sf_dir):
    results = run_all(spark, sf_dir)
    bad = {k: v for k, v in results.items() if v}
    assert not bad, f"oracle mismatches: {bad}"


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from parquet_rewriter_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    spark = get_spark(app_name="oracle-harness", shuffle_partitions=8)
    results = run_all(spark, sf, only)
    n_ok = sum(1 for v in results.values() if not v)
    for name, probs in sorted(results.items()):
        status = "OK " if not probs else "FAIL"
        print(f"{status} {name}" + ("" if not probs else f"  -> {probs[0]}"))
    print(f"\n{n_ok}/{len(results)} queries match oracle at {sf}")
    sys.exit(0 if n_ok == len(results) else 1)
