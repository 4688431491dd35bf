"""Manifest-derived bucket partitioning for merge writes.

The merge write avoids RangePartitioning's sampling job (which would
re-execute the whole union — a second full-width read of every dirty
file) by assigning each row a bucket id searchsorted from the manifest's
key bounds, identity-remapped so Spark's hash exchange places exactly
one bucket per partition. These tests pin the three load-bearing claims:
(1) the numpy Murmur3 mirror matches Spark's ``F.hash`` bit-for-bit,
(2) the remap is an exact partitioner end-to-end, and (3) the bucketed
merge plan carries ONE hash exchange and no range/sampling machinery.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from parquet_rewriter_spark.operators.merge import (
    _BUCKET,
    _bucket_expr,
    _bucket_udf,
    _identity_remap,
    _murmur3_int32,
    _np_bounds,
    apply_mutations,
    merge_into_table,
    plan_dirty_files,
)
from parquet_rewriter_spark.table import SortedTable


def test_numpy_murmur3_matches_spark_hash(spark):
    """_identity_remap is only exact if our Murmur3_x86_32.hashInt
    mirror equals the hash inside HashPartitioning — which F.hash
    exposes for IntegerType (same function, seed 42)."""
    vals = list(range(-257, 258)) + [2**31 - 1, -(2**31), 123456789, -987654321]
    df = spark.createDataFrame([(v,) for v in vals], "v int")
    got = {r.v: r.h for r in df.select("v", F.hash("v").alias("h")).collect()}
    mine = _murmur3_int32(np.array(vals, dtype=np.int64))
    assert all(got[v] == int(m) for v, m in zip(vals, mine))


def test_identity_remap_is_exact_and_distinct():
    for n in (1, 2, 3, 17, 93, 256, 1025):
        r = _identity_remap(n)
        h = _murmur3_int32(r.astype(np.int64)).astype(np.int64)
        assert (np.mod(h, n) == np.arange(n)).all()
        assert len(set(r.tolist())) == n


def test_repartition_places_one_bucket_per_partition(spark):
    """End-to-end through Spark's real exchange: n remapped bucket
    values → n partitions, each holding exactly one bucket."""
    n = 61
    remap = _identity_remap(n)
    m = F.create_map(
        *[x for b, v in enumerate(remap) for x in (F.lit(b), F.lit(int(v)))]
    )
    df = (
        spark.range(0, n * 100)
        .withColumn("b", (F.col("id") % n).cast("int"))
        .withColumn("v", m[F.col("b")])
        .repartition(n, F.col("v"))
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.countDistinct("b").alias("nb"))
        .collect()
    )
    assert len(df) == n and all(r.nb == 1 for r in df)


@pytest.mark.parametrize(
    "keys",
    [
        [5, 17, 42, 99, 1000],
        ["apple", "mango", "zebra"],
    ],
)
def test_bucket_expr_matches_searchsorted(spark, keys):
    """The JVM WHEN-tree must agree with np.searchsorted(side='left')
    (before remap) for every relational position: below, equal-to-cut,
    between, and beyond."""
    cuts = np.array(sorted(keys))
    n = len(cuts) + 1
    remap = _identity_remap(n)
    if isinstance(keys[0], str):
        probes = ["a", "apple", "applf", "mango", "nn", "zebra", "zz"]
        df = spark.createDataFrame([(p,) for p in probes], "k string")
    else:
        probes = [0, 5, 6, 17, 50, 99, 100, 10**6]
        df = spark.createDataFrame([(p,) for p in probes], "k long")
    expr = _bucket_expr("k", df.schema["k"].dataType, cuts, remap)
    got = [r.b for r in df.withColumn("b", expr).collect()]
    want = [int(remap[np.searchsorted(cuts, p, side="left")]) for p in probes]
    assert got == want


def test_timestamp_cut_literals_are_process_tz_safe(spark):
    """_np_bounds renders timestamp cuts naive in the SESSION zone
    (UTC here); the WHEN-tree literals must mean those same instants
    even when the Python PROCESS zone differs — F.lit(naive datetime)
    converts via time.mktime (process zone) and would shift every cut
    by the offset, silently degrading bucket balance and diverging
    from the _bucket_udf path."""
    import time

    old = os.environ.get("TZ")
    os.environ["TZ"] = "Pacific/Kiritimati"  # UTC+14, no DST
    time.tzset()
    try:
        cuts = np.array(
            ["2021-06-01T06:00:00", "2021-06-01T18:00:00"],
            dtype="datetime64[us]",
        )
        remap = _identity_remap(3)
        vals = [
            "2021-06-01 00:00:00", "2021-06-01 06:00:00",
            "2021-06-01 12:00:00", "2021-06-01 18:00:00",
            "2021-06-02 00:00:00",
        ]
        want = [
            int(remap[i])
            for i in np.searchsorted(
                cuts, np.array(vals, dtype="datetime64[us]"), side="left"
            )
        ]
        for t in ("timestamp", "timestamp_ntz"):
            df = spark.createDataFrame([(v,) for v in vals], "s string").select(
                "s", F.col("s").cast(t).alias("k")
            )
            expr = _bucket_expr("k", df.schema["k"].dataType, cuts, remap)
            got = {r["s"]: r["b"] for r in df.select("s", expr.alias("b")).collect()}
            assert [got[v] for v in vals] == want, t
    finally:
        if old is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old
        time.tzset()


def test_bucket_udf_agrees_with_expr(spark):
    """Above JVM_BUCKET_MAX_CUTS the Arrow UDF takes over — same
    bucket function, same remap."""
    cuts = np.arange(10, 5000, 10)
    remap = _identity_remap(len(cuts) + 1)
    df = spark.range(0, 3000).select((F.col("id") * 3).alias("k"))
    via_udf = df.withColumn("b", _bucket_udf(spark, cuts, remap)(F.col("k")))
    got = {r.k: r.b for r in via_udf.collect()}
    for k in (0, 10, 11, 4999, 4990, 100000):
        if k in got:
            assert got[k] == int(remap[np.searchsorted(cuts, k, side="left")])
    ks = np.array(sorted(got))
    want = remap[np.searchsorted(cuts, ks, side="left")]
    assert [got[int(k)] for k in ks] == [int(w) for w in want]


def test_bucketed_merge_plan_single_hash_exchange_no_sampling(spark, sf_dir):
    """The whole point: one hash exchange on the bucket id serves the
    dedup window and the sorted write; no RangePartitioning (whose
    sampling job would re-read every dirty input)."""
    base = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    muts = (
        base.filter(F.col("o_orderkey") % 17 == 0)
        .withColumn("op", F.lit("UPSERT"))
    )
    cuts = np.arange(0, int(1.5e6), 10_000)
    merged = apply_mutations(
        base, muts, "o_orderkey", bucket_cuts=cuts, num_partitions=len(cuts) + 1
    )
    p = merged._sc._jvm.PythonSQLUtils.explainString(
        merged._jdf.queryExecution(), "formatted"
    )
    assert p.count("Arguments: hashpartitioning") == 1, p
    assert "rangepartitioning" not in p.lower(), p
    assert "Window" in p, p
    # pure JVM below the cut threshold: no Python eval stage
    assert "ArrowEvalPython" not in p, p


def test_bucketed_merge_end_to_end_files_sorted(spark, tmp_path, monkeypatch):
    """A merge that takes the bucketed write (dirty bytes > threshold —
    forced here) must keep every output file internally key-sorted with
    accurate manifest bounds, across updates, gap inserts, head/tail
    inserts, deletes."""
    import random

    import parquet_rewriter_spark.operators.merge as merge_mod

    monkeypatch.setattr(merge_mod, "BUCKET_WRITE_MIN_BYTES", 0)

    from pyspark.sql import Row

    rng = random.Random(7)
    keys = sorted(rng.sample(range(0, 200_000, 3), 8_000))
    df = spark.createDataFrame(
        [Row(key=int(k), value=k * 2) for k in keys], "key long, value long"
    )
    t = SortedTable.create(
        spark, os.path.join(str(tmp_path), "t"), df, "key",
        max_records_per_file=200,
    )
    ups = {k: k * 10 for k in keys[:: 37]}            # spread updates
    ups[-5] = 1                                        # head insert
    ups[10**7] = 2                                     # tail insert
    ups[keys[100] + 1] = 3                             # gap insert
    # same-key UPSERT+DELETE resolves DELETE-first by the engine's
    # documented tiebreak — keep the sets disjoint so the python-dict
    # expectation (update wins) matches
    dels = set(keys[5::211]) - set(ups)
    muts = spark.createDataFrame(
        [Row(key=int(k), value=int(v), op="UPSERT") for k, v in ups.items()]
        + [Row(key=int(k), value=None, op="DELETE") for k in dels],
        "key long, value long, op string",
    )
    m = t.manifest()
    dirty, _clean = plan_dirty_files(spark, m, muts)
    assert len(dirty) > 32, "fixture must exercise the bucketed path"
    res = merge_into_table(t, muts, allow_splice=False)
    assert res["path"] == "distributed"

    expected = {k: k * 2 for k in keys}
    for k in dels:
        expected.pop(k, None)
    expected.update(ups)
    got = {r.key: r.value for r in t.read().collect()}
    assert got == expected
    mm = t.manifest()
    for e in mm.files:
        vals = [
            r.key
            for r in spark.read.parquet(os.path.join(t.path, e.name))
            .select("key")
            .collect()
        ]
        assert vals == sorted(vals), e.name
        assert vals[0] == e.key_min and vals[-1] == e.key_max


def test_bucketed_merge_timestamp_key(spark, tmp_path, monkeypatch):
    """Timestamp keys exercise the literal-cast path of the WHEN tree
    (footer bounds are tz-aware; lit() casts to the key's exact type)."""
    import datetime as dt

    import parquet_rewriter_spark.operators.merge as merge_mod

    monkeypatch.setattr(merge_mod, "BUCKET_WRITE_MIN_BYTES", 0)

    from pyspark.sql import Row

    base_ts = dt.datetime(2025, 1, 1)
    rows = [
        Row(ts=base_ts + dt.timedelta(minutes=i), v=i) for i in range(4_000)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v int")
    t = SortedTable.create(
        spark, os.path.join(str(tmp_path), "tt"), df, "ts",
        max_records_per_file=100,
    )
    muts = spark.createDataFrame(
        [
            Row(ts=base_ts + dt.timedelta(minutes=i), v=-i, op="UPSERT")
            for i in range(0, 4_000, 53)
        ],
        "ts timestamp, v int, op string",
    )
    m = t.manifest()
    dirty, _ = plan_dirty_files(spark, m, muts)
    assert len(dirty) > 32
    merge_into_table(t, muts, allow_splice=False)
    got = {r.ts: r.v for r in t.read().collect()}
    assert len(got) == 4_000
    for i in range(0, 4_000, 53):
        assert got[base_ts + dt.timedelta(minutes=i)] == -i


def test_compaction_cuts_balance_output_files(spark, tmp_path, monkeypatch):
    """compact() must produce size-balanced files from manifest row
    counts alone — no sampling job — even when input files are wildly
    uneven. (Byte threshold forced to 0: the zero-sampling path is the
    default only above ~1 GiB of source bytes.)"""
    from pyspark.sql import Row

    import parquet_rewriter_spark.operators.merge as merge_mod
    from parquet_rewriter_spark.operators.compact import compact
    from parquet_rewriter_spark.operators.merge import merge_into_table

    monkeypatch.setattr(merge_mod, "BUCKET_WRITE_MIN_BYTES", 0)

    df = spark.createDataFrame(
        [Row(key=i, v=i % 7) for i in range(20_000)], "key long, v long"
    )
    t = SortedTable.create(
        spark, os.path.join(str(tmp_path), "c"), df, "key",
        max_records_per_file=500,
    )
    # fragment the tail: tiny merges append small files
    for lo in (50_000, 60_000):
        muts = spark.createDataFrame(
            [Row(key=lo + i, v=1, op="UPSERT") for i in range(40)],
            "key long, v long, op string",
        )
        merge_into_table(t, muts, allow_splice=False)
    res = compact(t, max_records_per_file=2_000)
    m = t.manifest()
    rows = [e.rows for e in m.files]
    assert sum(rows) == 20_080
    assert max(rows) <= 2_000
    # balanced: every file but the tail within ±1 source file of target
    assert min(rows[:-1]) >= 1_000, rows
    # still sorted + bounds exact
    for e in m.files:
        vals = [
            r.key
            for r in spark.read.parquet(os.path.join(t.path, e.name))
            .select("key")
            .collect()
        ]
        assert vals == sorted(vals)
        assert vals[0] == e.key_min and vals[-1] == e.key_max
    assert res["files_after"] == len(m.files)


def test_bucket_expr_property_random_long_cuts(spark):
    """Property: for random sorted long cuts and random probe keys, the
    JVM WHEN-tree equals remap[np.searchsorted(cuts, k, 'left')] — the
    boundary cases (k == cut, adjacent cuts, duplicates collapsed by
    np.unique) all reduce to this one identity."""
    from hypothesis import given, settings, strategies as st

    from pyspark.sql.types import LongType

    @settings(max_examples=12, deadline=None)
    @given(
        cuts=st.lists(
            st.integers(min_value=-(2**40), max_value=2**40),
            min_size=1, max_size=40, unique=True,
        ),
        probes=st.lists(
            st.integers(min_value=-(2**41), max_value=2**41),
            min_size=1, max_size=25,
        ),
    )
    def check(cuts, probes):
        arr = np.array(sorted(cuts), dtype=np.int64)
        # probe the exact boundaries too
        probes = probes + [int(c) for c in arr[:3]] + [int(arr[-1]) + 1]
        remap = _identity_remap(len(arr) + 1)
        df = spark.createDataFrame([(int(p),) for p in probes], "k long")
        expr = _bucket_expr("k", LongType(), arr, remap)
        got = {r.k: r.b for r in df.withColumn("b", expr).collect()}
        for p in probes:
            want = int(remap[np.searchsorted(arr, p, side="left")])
            assert got[int(p)] == want, (p, arr)

    check()


def test_bucketed_merge_udf_path_end_to_end(spark, tmp_path, monkeypatch):
    """Above JVM_BUCKET_MAX_CUTS the bucket id comes from the Arrow
    searchsorted UDF instead of the WHEN tree — drive a real merge
    through that path (cut threshold forced to 0) and check
    reconciliation + file invariants survive."""
    import parquet_rewriter_spark.operators.merge as merge_mod
    from pyspark.sql import Row

    monkeypatch.setattr(merge_mod, "BUCKET_WRITE_MIN_BYTES", 0)
    monkeypatch.setattr(merge_mod, "JVM_BUCKET_MAX_CUTS", 0)  # force UDF

    keys = list(range(0, 30_000, 3))
    df = spark.createDataFrame(
        [Row(key=int(k), v=int(k)) for k in keys], "key long, v long"
    )
    t = SortedTable.create(
        spark, os.path.join(str(tmp_path), "u"), df, "key",
        max_records_per_file=200,  # 50 files -> 50 cuts, all via UDF
    )
    ups = {k: -k for k in keys[::41]}
    muts = spark.createDataFrame(
        [Row(key=int(k), v=int(v), op="UPSERT") for k, v in ups.items()],
        "key long, v long, op string",
    )
    res = merge_into_table(t, muts, allow_splice=False)
    assert res["path"] == "distributed"
    expected = {k: int(k) for k in keys}
    expected.update(ups)
    got = {r.key: r.v for r in t.read().collect()}
    assert got == expected
    for e in t.manifest().files:
        vals = [
            r.key
            for r in spark.read.parquet(os.path.join(t.path, e.name))
            .select("key").collect()
        ]
        assert vals == sorted(vals)
        assert vals[0] == e.key_min and vals[-1] == e.key_max


def test_bucketed_merge_timestamp_key_udf_path(spark, tmp_path, monkeypatch):
    """Timestamp cuts through the ARROW path (datetime64 searchsorted +
    tz coercion) — the when-tree variant above covers literals; this
    covers the broadcast-cuts branch."""
    import datetime as dt

    import parquet_rewriter_spark.operators.merge as merge_mod
    from pyspark.sql import Row

    monkeypatch.setattr(merge_mod, "BUCKET_WRITE_MIN_BYTES", 0)
    monkeypatch.setattr(merge_mod, "JVM_BUCKET_MAX_CUTS", 0)

    base_ts = dt.datetime(2025, 3, 1)
    rows = [Row(ts=base_ts + dt.timedelta(minutes=i), v=i) for i in range(2_000)]
    df = spark.createDataFrame(rows, "ts timestamp, v int")
    t = SortedTable.create(
        spark, os.path.join(str(tmp_path), "tu"), df, "ts",
        max_records_per_file=100,
    )
    muts = spark.createDataFrame(
        [Row(ts=base_ts + dt.timedelta(minutes=i), v=-i, op="UPSERT")
         for i in range(0, 2_000, 37)],
        "ts timestamp, v int, op string",
    )
    res = merge_into_table(t, muts, allow_splice=False)
    assert res["path"] == "distributed"
    got = {r.ts: r.v for r in t.read().collect()}
    assert len(got) == 2_000
    for i in range(0, 2_000, 37):
        assert got[base_ts + dt.timedelta(minutes=i)] == -i


def test_bucketed_merge_string_key(spark, tmp_path, monkeypatch):
    """String-keyed table through the bucketed write: string cut
    literals in the WHEN tree, lexicographic buckets."""
    import parquet_rewriter_spark.operators.merge as merge_mod
    from pyspark.sql import Row

    monkeypatch.setattr(merge_mod, "BUCKET_WRITE_MIN_BYTES", 0)

    keys = [f"doc-{i:06d}" for i in range(0, 9_000, 3)]
    df = spark.createDataFrame(
        [Row(key=k, v=len(k) + i) for i, k in enumerate(keys)],
        "key string, v long",
    )
    t = SortedTable.create(
        spark, os.path.join(str(tmp_path), "s"), df, "key",
        max_records_per_file=100,
    )
    ups = {k: -1 for k in keys[::53]}
    muts = spark.createDataFrame(
        [Row(key=k, v=int(v), op="UPSERT") for k, v in ups.items()],
        "key string, v long, op string",
    )
    res = merge_into_table(t, muts, allow_splice=False)
    assert res["path"] == "distributed"
    got = {r.key: r.v for r in t.read().collect()}
    assert len(got) == len(keys)
    for k in ups:
        assert got[k] == -1
    for e in t.manifest().files:
        vals = [
            r.key
            for r in spark.read.parquet(os.path.join(t.path, e.name))
            .select("key").collect()
        ]
        assert vals == sorted(vals)
        assert vals[0] == e.key_min and vals[-1] == e.key_max


def test_bucketed_merge_date_key(spark, tmp_path, monkeypatch):
    """DATE-keyed table through the bucketed write: date cut literals
    in the WHEN tree (F.lit(datetime.date) is tz-free, unlike naive
    datetimes) and object-dtype searchsorted on the planning side."""
    import datetime as dt

    import parquet_rewriter_spark.operators.merge as merge_mod
    from pyspark.sql import Row

    monkeypatch.setattr(merge_mod, "BUCKET_WRITE_MIN_BYTES", 0)

    d0 = dt.date(2024, 1, 1)
    rows = [Row(day=d0 + dt.timedelta(days=i), v=i) for i in range(1_500)]
    df = spark.createDataFrame(rows, "day date, v int")
    t = SortedTable.create(
        spark, os.path.join(str(tmp_path), "dk"), df, "day",
        max_records_per_file=100,
    )
    muts = spark.createDataFrame(
        [Row(day=d0 + dt.timedelta(days=i), v=-i, op="UPSERT")
         for i in range(0, 1_500, 41)],
        "day date, v int, op string",
    )
    res = merge_into_table(t, muts, allow_splice=False)
    assert res["path"] == "distributed"
    assert res["write_partitioner"] == "bucketed"
    got = {r.day: r.v for r in t.read().collect()}
    assert len(got) == 1_500
    for i in range(0, 1_500, 41):
        assert got[d0 + dt.timedelta(days=i)] == -i
    for e in t.manifest().files:
        vals = [
            r.day
            for r in spark.read.parquet(os.path.join(t.path, e.name))
            .select("day").collect()
        ]
        assert vals == sorted(vals)
        assert vals[0] == e.key_min and vals[-1] == e.key_max


def test_bucketed_merge_decimal_key(spark, tmp_path, monkeypatch):
    """DECIMAL-keyed table through the bucketed write: Decimal cut
    literals in the WHEN tree and object-dtype bounds on the planning
    side (manifest round-trips Decimals typed, not stringified)."""
    from decimal import Decimal

    import parquet_rewriter_spark.operators.merge as merge_mod
    from pyspark.sql import Row

    monkeypatch.setattr(merge_mod, "BUCKET_WRITE_MIN_BYTES", 0)

    keys = [Decimal(i) / 100 for i in range(0, 9_000, 7)]
    df = spark.createDataFrame(
        [Row(key=k, v=i) for i, k in enumerate(keys)],
        "key decimal(10,2), v int",
    )
    t = SortedTable.create(
        spark, os.path.join(str(tmp_path), "deck"), df, "key",
        max_records_per_file=100,
    )
    ups = {k: -1 for k in keys[::43]}
    muts = spark.createDataFrame(
        [Row(key=k, v=v, op="UPSERT") for k, v in ups.items()],
        "key decimal(10,2), v int, op string",
    )
    res = merge_into_table(t, muts, allow_splice=False)
    assert res["path"] == "distributed"
    assert res["write_partitioner"] == "bucketed"
    got = {r.key: r.v for r in t.read().collect()}
    assert len(got) == len(keys)
    for k in ups:
        assert got[k] == -1
    for e in t.manifest().files:
        vals = [
            r.key
            for r in spark.read.parquet(os.path.join(t.path, e.name))
            .select("key").collect()
        ]
        assert vals == sorted(vals)
        assert vals[0] == e.key_min and vals[-1] == e.key_max


def test_skew_gate_falls_back_and_splits_hot_range(spark, tmp_path, monkeypatch):
    """A bulk insert aimed at ONE file's key range must not serialize
    into a single bucket task: the skew gate (mutations per bucket >
    SKEW_BUCKET_FACTOR x mrpf) rejects the bucketed write and re-plans
    with a range exchange whose partition count covers the batch, so
    the hot range splits across tasks."""
    import parquet_rewriter_spark.operators.merge as merge_mod
    from pyspark.sql import Row

    monkeypatch.setattr(merge_mod, "BUCKET_WRITE_MIN_BYTES", 0)

    # 1000 sparse keys -> 2 files, file 0 spanning [0, ~499000]
    df = spark.createDataFrame(
        [Row(key=int(k * 1000), v=int(k)) for k in range(1_000)],
        "key long, v long",
    )
    t = SortedTable.create(
        spark, os.path.join(str(tmp_path), "sk"), df, "key",
        max_records_per_file=500,
    )

    seen = {}
    orig = merge_mod.apply_mutations

    def spy(*a, **kw):
        seen.clear()
        seen.update(kw)
        return orig(*a, **kw)

    monkeypatch.setattr(merge_mod, "apply_mutations", spy)

    # control: a small scattered update stays on the bucketed path
    small = spark.createDataFrame(
        [Row(key=int(k * 1000), v=-1, op="UPSERT") for k in range(0, 1_000, 97)],
        "key long, v long, op string",
    )
    res_small = merge_into_table(t, small, allow_splice=False)
    assert seen.get("bucket_cuts") is not None
    # the decision is production-observable in the report, no spy needed
    assert res_small["write_partitioner"] == "bucketed"
    assert res_small["n_buckets"] == res_small["files_dirty"] + 1
    assert 0 < res_small["max_bucket_mutations"] <= 8 * 500

    # skew: 20k inserts, all inside file 0's range (8 x 500 = 4000 cap)
    muts = spark.range(0, 20_000).selectExpr(
        "CAST(id * 20 + 1 AS LONG) AS key", "CAST(0 AS LONG) AS v",
        "'UPSERT' AS op",
    )
    res = merge_into_table(t, muts, allow_splice=False)
    assert res["path"] == "distributed"
    assert seen.get("bucket_cuts") is None
    assert seen.get("range_partition") is True
    assert seen.get("num_partitions") >= 20_000 // 500  # boosted past len(dirty)
    assert res["write_partitioner"] == "range_skew_boost"
    assert res["n_buckets"] is None
    assert res["max_bucket_mutations"] > 8 * 500  # the gate's evidence
    assert t.read().count() == 1_000 + 20_000


def test_compaction_cuts_edges(spark):
    """Degenerate shapes: single source file and single output bucket
    yield None (callers fall back to the plain write); a file bigger
    than several targets cuts once per crossing, deduplicated."""
    from types import SimpleNamespace

    from parquet_rewriter_spark.operators.merge import compaction_cuts

    E = lambda mn, mx, rows: SimpleNamespace(key_min=mn, key_max=mx, rows=rows)
    # one source file -> nothing to cut
    assert compaction_cuts([E(0, 9, 100)], 10, spark) is None
    # everything fits one target -> no cuts
    assert compaction_cuts([E(0, 9, 5), E(10, 19, 5)], 100, spark) is None
    # steady stream: cut at every target crossing
    cuts = compaction_cuts(
        [E(i * 10, i * 10 + 9, 10) for i in range(10)], 20, spark
    )
    assert cuts is not None and list(cuts) == [19, 39, 59, 79]
    # a jumbo file crossing several targets cuts once at its boundary
    # (rolls handle the interior), then resumes at the next crossing
    cuts = compaction_cuts([E(0, 9, 95), E(10, 19, 5), E(20, 29, 5)], 20, spark)
    assert cuts is not None and list(cuts) == [9, 19]
