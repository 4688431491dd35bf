"""Hidden (transform) partitioning — Iceberg-style layout where the
PARTITION columns are derived from data columns (day(ts), bucket(id)),
and readers never mention them: query predicates on the BASE columns
are translated into partition-directory predicates automatically.

Why it matters at 100 TB: hive layouts force every query author to
know the physical layout (`WHERE event_date = ...` next to `WHERE ts
BETWEEN ...` — forget one and you scan the table). With a transform
spec saved NEXT TO the data (`_partition_spec.json`), the reader
derives `p_day_ts IN (...)` from a ts range and `p_bucket_user_id = h`
from a user_id equality, so planning-time directory pruning happens on
every query, not just the disciplined ones.

Supported transforms (each pure, order-preserving where pruning needs
it): ``day`` (timestamp → 'yyyy-MM-dd' string) and ``bucket[N]``
(xxhash64 mod N). Both are computed by JVM expressions at write AND at
predicate-derivation time, so the mapping can never drift.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

SPEC_NAME = "_partition_spec.json"
SPECS_NAME = "_partition_specs.json"


def _pcol(transform: str, col: str) -> str:
    return f"p_{transform}_{col}"


def _transform_expr(transform: str, col: str, n: int | None):
    if transform == "day":
        return F.date_format(F.col(col), "yyyy-MM-dd")
    if transform == "bucket":
        return F.pmod(F.xxhash64(F.col(col)), F.lit(n))
    raise ValueError(f"unknown transform {transform!r}")


def write_hidden_partitioned(
    df: DataFrame,
    path: str,
    spec: list[tuple],
    mode: str = "overwrite",
) -> None:
    """Write ``df`` partitioned by DERIVED columns.

    ``spec``: list of ("day", col) or ("bucket", col, n). The derived
    columns are appended for the write only; the spec sidecar lets
    ``read_hidden_partitioned`` reconstruct them for pruning.
    """
    _write_under_spec(df, path, spec, mode)
    with open(os.path.join(path, SPEC_NAME), "w") as fh:
        json.dump([list(s) for s in spec], fh)


def _write_under_spec(
    df: DataFrame, root: str, spec: list[tuple], mode: str
) -> None:
    out = df
    pcols = []
    for s in spec:
        transform, col = s[0], s[1]
        n = s[2] if len(s) > 2 else None
        name = _pcol(transform, col)
        out = out.withColumn(name, _transform_expr(transform, col, n))
        pcols.append(name)
    # one writer per partition directory: without this every task writes
    # a sliver into every directory it has rows for — tasks × dirs small
    # files, the classic partitioned-write explosion (at 1000 executors
    # it's also 1000× the commit-protocol listing). A pathologically hot
    # partition would want a salt added here; these transforms (day,
    # bucket-N) are cardinality-bounded by design.
    out = out.repartition(*[F.col(c) for c in pcols])
    out.write.mode(mode).partitionBy(*pcols).parquet(root)


def _load_specs(path: str) -> list[dict]:
    """All partition-spec epochs of a table, oldest first.

    A legacy single-spec table (``_partition_spec.json``, data at the
    table root) is presented as a one-entry list rooted at ``"."`` —
    evolution never rewrites it.
    """
    sp = os.path.join(path, SPECS_NAME)
    if os.path.exists(sp):
        with open(sp) as fh:
            return json.load(fh)
    with open(os.path.join(path, SPEC_NAME)) as fh:
        return [{"id": 0, "spec": json.load(fh), "root": "."}]


def _spec_root(path: str, entry: dict) -> str:
    return path if entry["root"] == "." else os.path.join(path, entry["root"])


def evolve_partition_spec(path: str, new_spec: list[tuple]) -> int:
    """Iceberg-style partition evolution: change how FUTURE data is laid
    out without touching a byte of existing data.

    Each epoch's files stay under that epoch's own root (the table root
    for the original spec; ``_spec{N}/`` — an underscore-hidden dir the
    parquet reader skips — for evolved ones), so old directories keep
    pruning under their old transforms and new appends land under the
    new ones. At 100 TB a re-partitioning rewrite is days of cluster
    time; this is one sidecar swap. Returns the new spec id.
    """
    specs = _load_specs(path)
    nid = specs[-1]["id"] + 1
    specs.append(
        {"id": nid, "spec": [list(s) for s in new_spec], "root": f"_spec{nid}"}
    )
    import uuid

    tmp = os.path.join(path, SPECS_NAME + f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        json.dump(specs, fh)
    os.replace(tmp, os.path.join(path, SPECS_NAME))
    return nid


def append_hidden_partitioned(df: DataFrame, path: str) -> None:
    """Append ``df`` under the table's CURRENT (latest) partition spec."""
    specs = _load_specs(path)
    cur = specs[-1]
    _write_under_spec(df, _spec_root(path, cur), [tuple(s) for s in cur["spec"]], "append")


def read_hidden_partitioned(
    spark: SparkSession,
    path: str,
    eq: dict[str, Any] | None = None,
    ranges: dict[str, tuple[Any, Any]] | None = None,
) -> DataFrame:
    """Read with automatic partition-predicate derivation.

    ``eq``: base-column equality predicates; ``ranges``: inclusive
    (lo, hi) base-column ranges. Each is applied as a ROW predicate
    (pushed to the parquet scan) AND — when the spec has a transform
    over that column — as a derived PARTITION predicate, which Catalyst
    turns into planning-time directory pruning (PartitionFilters).

    Under partition evolution each spec epoch is read from its own
    root with ITS OWN derived partition predicates (old data prunes
    under the old layout, new data under the new), then the epochs are
    unioned with the derived p_* columns dropped — the caller sees one
    relation with only base columns, whatever the layout history.
    """
    eq = eq or {}
    ranges = ranges or {}
    parts: list[DataFrame] = []
    for entry in _load_specs(path):
        root = _spec_root(path, entry)
        if not os.path.isdir(root) or not any(
            not e.startswith(("_", ".")) for e in os.listdir(root)
        ):
            continue  # an evolved spec nothing was appended under yet
        parts.append(
            _read_one_spec(spark, root, [tuple(s) for s in entry["spec"]], eq, ranges)
        )
    if not parts:
        raise FileNotFoundError(f"no data under any partition spec of {path}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _read_one_spec(
    spark: SparkSession,
    root: str,
    spec: list[tuple],
    eq: dict[str, Any],
    ranges: dict[str, tuple[Any, Any]],
) -> DataFrame:
    # Explicit top-level listing instead of handing Spark the root: the
    # LEGACY root also hosts the `_specN/` epoch dirs, and letting the
    # file lister walk-and-skip those logs a spurious "All paths were
    # ignored: _specN" WARN on every read — log noise users report as a
    # bug. basePath keeps hidden-partition column discovery identical.
    children = sorted(
        os.path.join(root, e)
        for e in os.listdir(root)
        if not e.startswith(("_", "."))
    )
    df = spark.read.option("basePath", root).parquet(*children)

    for col, v in eq.items():
        df = df.filter(F.col(col) == F.lit(v))
    for col, (lo, hi) in ranges.items():
        if lo is not None:
            df = df.filter(F.col(col) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(col) <= F.lit(hi))

    pcols = []
    for s in spec:
        transform, col = s[0], s[1]
        n = s[2] if len(s) > 2 else None
        name = _pcol(transform, col)
        pcols.append(name)
        if transform == "bucket" and col in eq:
            # same JVM hash at plan time: filter on the literal's
            # bucket. xxhash64 is TYPE-sensitive — the literal must be
            # cast to the column's exact type or the buckets disagree
            # (int 7 and bigint 7 hash differently).
            lit = F.lit(eq[col]).cast(df.schema[col].dataType)
            df = df.filter(F.col(name) == F.pmod(F.xxhash64(lit), F.lit(n)))
        elif transform == "day" and col in ranges:
            lo, hi = ranges[col]
            lo_d = _day_str(lo)
            hi_d = _day_str(hi)
            if lo_d is not None:
                df = df.filter(F.col(name) >= lo_d)
            if hi_d is not None:
                df = df.filter(F.col(name) <= hi_d)
        elif transform == "day" and col in eq:
            df = df.filter(F.col(name) == _day_str(eq[col]))
    return df.drop(*pcols)


def _day_str(v: Any) -> str | None:
    if v is None:
        return None
    if isinstance(v, str):
        return v[:10]
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.strftime("%Y-%m-%d")
    raise ValueError(f"cannot derive day partition bound from {type(v)}")
