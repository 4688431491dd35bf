"""Mutation-correctness tests — ports of the reference's five scenarios
(ParquetRewriterTests.java:273-341) to SortedTable/merge, with the same
set-reconciliation assertions (validateMutations,
ParquetRewriterTests.java:215-244): deleted keys absent, upserted keys
present with exact payloads, survivors intact exactly once, no extras,
output key-sorted with no duplicates. Keys are typed longs (SURVEY.md
§1.3 — we do not replicate the signed-lexicographic binary quirk).
"""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import Row, functions as F

from parquet_rewriter_spark.operators import merge_into_table, plan_dirty_files
from parquet_rewriter_spark.table import SortedTable


def _mk_table(spark, tmp_path, keys, max_records_per_file=100):
    rng = random.Random(42)
    rows = [Row(key=int(k), value=bytes(rng.randrange(256) for _ in range(20))) for k in keys]
    df = spark.createDataFrame(rows, schema="key long, value binary")
    t = SortedTable.create(
        spark, os.path.join(str(tmp_path), "t"), df, "key", max_records_per_file=max_records_per_file
    )
    base = {r["key"]: bytes(r["value"]) for r in rows}
    return t, base


def _mutations_df(spark, upserts: dict, deletes: set):
    rows = [Row(key=int(k), value=v, op="UPSERT") for k, v in upserts.items()]
    rows += [Row(key=int(k), value=None, op="DELETE") for k in sorted(deletes)]
    return spark.createDataFrame(rows, schema="key long, value binary, op string")


def _validate(t: SortedTable, base: dict, upserts: dict, deletes: set):
    """validateMutations port (ParquetRewriterTests.java:215-244)."""
    got = {r["key"]: bytes(r["value"]) for r in t.read().collect()}
    expected = dict(base)
    for k in deletes:
        expected.pop(k, None)
    expected.update(upserts)
    assert got == expected  # absence of deleted, presence+payload of upserted,
    # survivors exact, no extras, no duplicate keys (dict collision would hide
    # dups — check count separately)
    assert t.read().count() == len(expected)
    # per-file sortedness + manifest range accuracy
    m = t.manifest()
    for e in m.files:
        vals = [
            r["key"]
            for r in t.spark.read.parquet(os.path.join(t.path, e.name)).select("key").collect()
        ]
        assert vals == sorted(vals)
        assert vals[0] == e.key_min and vals[-1] == e.key_max


def test_deletion_head_middle_tail(spark, tmp_path):
    # deletionTest (ParquetRewriterTests.java:273-282)
    keys = list(range(1, 1000))
    t, base = _mk_table(spark, tmp_path, keys)
    deletes = {1, 500, 999}
    merge_into_table(t, _mutations_df(spark, {}, deletes))
    _validate(t, base, {}, deletes)


def test_insert_before_first_and_after_last(spark, tmp_path):
    # insertTest keys 0 and 10000 (ParquetRewriterTests.java:285-296)
    keys = list(range(1, 1000))
    t, base = _mk_table(spark, tmp_path, keys)
    ups = {0: b"x" * 20, 10000: b"y" * 20}
    res = merge_into_table(t, _mutations_df(spark, ups, set()))
    _validate(t, base, ups, set())
    # head/tail inserts hit no existing range → pure-insert, zero dirty files
    assert res["files_dirty"] == 0


def test_combo_mixed_ops(spark, tmp_path):
    # comboTest (ParquetRewriterTests.java:298-316)
    keys = list(range(1, 2000, 2))  # odd keys → gaps at every even key
    t, base = _mk_table(spark, tmp_path, keys, max_records_per_file=64)
    rng = random.Random(7)
    ups = {k: bytes(rng.randrange(256) for _ in range(20)) for k in [2, 501, 1001, 1998, 4000]}
    deletes = {1, 999, 1999, 555555}  # 555555 absent → no-op delete
    merge_into_table(t, _mutations_df(spark, ups, deletes))
    _validate(t, base, ups, deletes - {555555})


def test_no_changes_passthrough(spark, tmp_path):
    # noChangesTest (ParquetRewriterTests.java:318-323): clean files are
    # not rewritten — bytes and mtimes unchanged, manifest entries kept.
    keys = list(range(1, 500))
    t, base = _mk_table(spark, tmp_path, keys)
    before = {e.name: os.path.getmtime(os.path.join(t.path, e.name)) for e in t.manifest().files}
    empty = spark.createDataFrame([], schema="key long, value binary, op string")
    res = merge_into_table(t, empty)
    _validate(t, base, {}, set())
    after = {e.name: os.path.getmtime(os.path.join(t.path, e.name)) for e in t.manifest().files}
    assert before == after
    assert res["files_dirty"] == 0 and res["files_written"] == 0


def test_upsert_replaces_existing(spark, tmp_path):
    keys = list(range(1, 300))
    t, base = _mk_table(spark, tmp_path, keys)
    ups = {150: b"z" * 20}
    merge_into_table(t, _mutations_df(spark, ups, set()))
    _validate(t, base, ups, set())


def test_large_set_high_density(spark, tmp_path):
    # largeSet (ParquetRewriterTests.java:325-341): ~50% deletes + ~50%
    # upserts. Scaled to 20k rows for test speed; density preserved.
    n = 20000
    keys = list(range(n))
    t, base = _mk_table(spark, tmp_path, keys, max_records_per_file=1000)
    rng = random.Random(99)
    deletes = {k for k in keys if rng.random() < 0.5}
    ups = {
        k: bytes(rng.randrange(256) for _ in range(20))
        for k in keys
        if k not in deletes and rng.random() < 0.5
    }
    merge_into_table(t, _mutations_df(spark, ups, deletes))
    _validate(t, base, ups, deletes)


def test_dirty_file_pruning_scales_with_dirty_fraction(spark, tmp_path):
    # The reference's raison d'être (BASELINE.md): merge cost tracks the
    # dirty fraction, not table size. 100 files, 1 mutated key → exactly
    # 1 dirty file read+rewritten, 99 passthrough.
    keys = list(range(10000))
    t, base = _mk_table(spark, tmp_path, keys, max_records_per_file=100)
    assert len(t.manifest().files) >= 50
    muts = _mutations_df(spark, {5000: b"q" * 20}, set())
    dirty, clean = plan_dirty_files(spark, t.manifest(), muts)
    assert len(dirty) == 1
    res = merge_into_table(t, muts)
    assert res["files_dirty"] == 1
    assert res["files_clean_passthrough"] == res["files_total"] - 1
    _validate(t, base, {5000: b"q" * 20}, set())


def test_dirty_planning_nested_overlapping_ranges(spark, tmp_path):
    """Regression (round-2 ADVICE): a wide file whose range NESTS over
    later narrow files must be found dirty even when an intermediate
    file breaks the contiguous-overlap chain. Ranges [(0,10000),
    (2000,2100), (3000,3100)], mutation key 5000 → ONLY the wide file
    contains it; the old chain-bounded probe returned an empty dirty set
    and the merge would have duplicated the key."""
    from parquet_rewriter_spark.table import Manifest, ManifestEntry

    m = Manifest(
        version=0,
        key="k",
        files=[
            ManifestEntry(name="wide.parquet", rows=1, bytes=1, key_min=0, key_max=10000),
            ManifestEntry(name="n1.parquet", rows=1, bytes=1, key_min=2000, key_max=2100),
            ManifestEntry(name="n2.parquet", rows=1, bytes=1, key_min=3000, key_max=3100),
        ],
    )
    muts = spark.createDataFrame([(5000,)], "k long")
    dirty, clean = plan_dirty_files(spark, m, muts)
    assert [e.name for e in dirty] == ["wide.parquet"]
    # key inside a narrow file hits BOTH it and the enclosing wide file
    muts2 = spark.createDataFrame([(2050,)], "k long")
    dirty2, _ = plan_dirty_files(spark, m, muts2)
    assert {e.name for e in dirty2} == {"wide.parquet", "n1.parquet"}
    # end-to-end: a real table whose layout produces a nested range
    t, base = _mk_table(spark, tmp_path, list(range(0, 1000)), max_records_per_file=100)
    # gap-insert a wide span (head + tail keys in one merge makes a wide file)
    wide = {-5: b"w" * 20, 5000: b"w" * 20}
    merge_into_table(t, _mutations_df(spark, wide, set()))
    # now mutate a key strictly between the wide file's bounds but outside
    # every narrow file — the wide file must be rewritten, key stays unique
    ups = {1500: b"u" * 20}
    merge_into_table(t, _mutations_df(spark, ups, set()))
    _validate(t, base, {**wide, **ups}, set())


def test_intra_batch_duplicate_keys_deterministic(spark, tmp_path):
    """Upsert + delete of the SAME key in one batch resolves
    deterministically (DELETE wins — the fixed tiebreak), and an explicit
    seq_col overrides it (highest sequence wins)."""
    from parquet_rewriter_spark.operators.merge import apply_mutations

    base = spark.createDataFrame([(1, b"old"), (2, b"keep")], "key long, value binary")
    muts = spark.createDataFrame(
        [(1, b"new", "UPSERT"), (1, None, "DELETE")],
        "key long, value binary, op string",
    )
    for _ in range(3):  # rerun-stable
        got = {r["key"]: bytes(r["value"]) for r in apply_mutations(base, muts, "key").collect()}
        assert got == {2: b"keep"}  # DELETE beat the same-batch UPSERT
    seq_muts = spark.createDataFrame(
        [(1, None, "DELETE", 1), (1, b"new", "UPSERT", 2)],
        "key long, value binary, op string, seq long",
    )
    got = {
        r["key"]: bytes(r["value"])
        for r in apply_mutations(base, seq_muts, "key", seq_col="seq").collect()
    }
    assert got == {1: b"new", 2: b"keep"}  # seq=2 UPSERT outranks seq=1 DELETE


def test_timestamp_keyed_table_manifest_roundtrip(spark, tmp_path):
    """Zone-map bounds of a timestamp key must round-trip the manifest
    JSON as timestamps (not strings) and still prune correctly after
    reload (round-2 ADVICE: default=str silently stringified them)."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [Row(ts=t0 + datetime.timedelta(minutes=i), v=i) for i in range(500)]
    df = spark.createDataFrame(rows, "ts timestamp, v long")
    t = SortedTable.create(
        spark, os.path.join(str(tmp_path), "ts_t"), df, "ts", max_records_per_file=100
    )
    m = SortedTable(spark, t.path).manifest()  # fresh object → JSON reload
    assert all(isinstance(e.key_min, datetime.datetime) for e in m.files)
    probe = t0 + datetime.timedelta(minutes=250)
    muts = spark.createDataFrame([Row(ts=probe, v=9999, op="UPSERT")], "ts timestamp, v long, op string")
    dirty, clean = plan_dirty_files(spark, m, muts)
    assert len(dirty) == 1 and len(clean) == len(m.files) - 1
    merge_into_table(t, muts)
    got = {r["ts"]: r["v"] for r in t.read().collect()}
    assert got[probe] == 9999 and len(got) == 500


def _mk_multi_rg_table(spark, tmp_path, n=1000, rg=100):
    """One part-file with n/rg row groups — built with pyarrow so row
    group boundaries are controlled (Spark writes one rg per file at
    these sizes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_rewriter_spark.table import Manifest, ManifestEntry

    path = os.path.join(str(tmp_path), "rg_t")
    os.makedirs(path)
    rng = random.Random(5)
    keys = list(range(n))
    vals = [bytes(rng.randrange(256) for _ in range(20)) for _ in keys]
    tbl = pa.table({"key": pa.array(keys, pa.int64()), "value": pa.array(vals, pa.binary())})
    fname = "part-base.parquet"
    pq.write_table(tbl, os.path.join(path, fname), row_group_size=rg)
    t = SortedTable(spark, path)
    t._commit_manifest(
        Manifest(
            version=0,
            key="key",
            files=[
                ManifestEntry(
                    name=fname,
                    rows=n,
                    bytes=os.path.getsize(os.path.join(path, fname)),
                    key_min=0,
                    key_max=n - 1,
                )
            ],
            schema_json=spark.read.parquet(os.path.join(path, fname)).schema.json(),
        )
    )
    return t, dict(zip(keys, vals))


def test_splice_rewrites_only_touched_row_groups(spark, tmp_path):
    """A 1-key upsert against a 10-row-group file must take the splice
    path, rewrite exactly ONE row group, and preserve every untouched
    row group's boundaries, key range and contents."""
    import pyarrow.parquet as pq

    t, base = _mk_multi_rg_table(spark, tmp_path)
    res = merge_into_table(t, _mutations_df(spark, {555: b"z" * 20}, set()))
    assert res["path"] == "rowgroup_splice", res
    assert res["rgs_rewritten"] == 1 and res["rgs_copied"] == 9, res
    assert res["files_written"] == 1
    _validate(t, base, {555: b"z" * 20}, set())
    new = [e for e in t.manifest().files][0]
    pf = pq.ParquetFile(os.path.join(t.path, new.name))
    assert pf.metadata.num_row_groups == 10
    for rg in range(10):
        md = pf.metadata.row_group(rg)
        assert md.num_rows == 100
        st = md.column(0).statistics
        assert (st.min, st.max) == (rg * 100, rg * 100 + 99)
        if rg != 5:  # untouched groups: exact original contents
            got = pf.read_row_group(rg).to_pydict()
            assert got["key"] == list(range(rg * 100, rg * 100 + 100))
            assert [bytes(v) for v in got["value"]] == [base[k] for k in got["key"]]


def test_splice_matches_distributed_path(spark, tmp_path):
    """Same mixed mutation batch through both paths → identical tables
    (inserts into gaps, head/tail inserts, deletes, replacements)."""
    ups = {0: b"h" * 20, 550: b"r" * 20, 999: b"t" * 20, 5000: b"i" * 20, -3: b"n" * 20}
    deletes = {10, 200, 999_999}
    t1, base = _mk_multi_rg_table(spark, tmp_path / "a")
    r1 = merge_into_table(t1, _mutations_df(spark, ups, deletes))
    t2, _ = _mk_multi_rg_table(spark, tmp_path / "b")
    r2 = merge_into_table(t2, _mutations_df(spark, ups, deletes), allow_splice=False)
    assert r1["path"] == "rowgroup_splice" and r2["path"] == "distributed"
    got1 = {(r["key"], bytes(r["value"])) for r in t1.read().collect()}
    got2 = {(r["key"], bytes(r["value"])) for r in t2.read().collect()}
    assert got1 == got2
    _validate(t1, base, ups, deletes - {999_999})


def test_splice_declines_duplicate_keys_and_large_batches(spark, tmp_path):
    """Duplicate keys within the batch (tiebreak is a Spark expression)
    must fall back to the distributed path."""
    t, base = _mk_multi_rg_table(spark, tmp_path)
    muts = spark.createDataFrame(
        [Row(key=5, value=b"a" * 20, op="UPSERT"), Row(key=5, value=None, op="DELETE")],
        "key long, value binary, op string",
    )
    res = merge_into_table(t, muts)
    assert res["path"] == "distributed"
    _validate(t, base, {}, {5})  # DELETE wins the deterministic tiebreak


def test_sequential_merges_and_vacuum(spark, tmp_path):
    keys = list(range(0, 1000))
    t, base = _mk_table(spark, tmp_path, keys)
    merge_into_table(t, _mutations_df(spark, {10: b"a" * 20}, {20}))
    merge_into_table(t, _mutations_df(spark, {10: b"b" * 20, 2000: b"c" * 20}, {10_000_000}))
    _validate(t, base, {10: b"b" * 20, 2000: b"c" * 20}, {20})
    removed = t.vacuum()
    assert removed  # superseded files got cleaned
    _validate(t, base, {10: b"b" * 20, 2000: b"c" * 20}, {20})


def test_merge_on_real_orders_table(spark, tmp_path, sf_dir):
    # End-to-end on the driver's orders fixture keyed by o_orderkey.
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    t = SortedTable.create(
        spark, os.path.join(str(tmp_path), "orders_t"), orders, "o_orderkey", max_records_per_file=200
    )
    muts = (
        orders.filter(F.col("o_orderkey") % 10 == 3)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("op", F.lit("UPSERT"))
        .unionByName(
            orders.filter(F.col("o_orderkey") % 10 == 7).withColumn("op", F.lit("DELETE"))
        )
    )
    merge_into_table(t, muts)
    got = t.read()
    n_orig = orders.count()
    n_del = orders.filter(F.col("o_orderkey") % 10 == 7).count()
    assert got.count() == n_orig - n_del
    doubled = got.join(
        orders.filter(F.col("o_orderkey") % 10 == 3).select("o_orderkey", F.col("o_totalprice").alias("tp")),
        "o_orderkey",
    )
    assert doubled.filter(F.abs(F.col("o_totalprice") - 2 * F.col("tp")) > 1e-9).count() == 0


def test_merge_all_types_roundtrip(spark, tmp_path):
    """Type-coverage merge (FIXTURES.md A3, from the reference's
    commented-out extended schema ParquetRewriterTests.java:358-369
    mapped to Spark types + nested/decimal/array/struct extensions):
    upsert + delete on a table carrying every scalar type plus
    array/struct, asserting exact payload round-trip through the
    sorted-write → merge → read cycle."""
    import datetime
    import decimal

    schema = (
        "key long, binary_field binary, string_field string, int32_field int, "
        "int64_field long, boolean_field boolean, float_field float, "
        "double_field double, ts_field timestamp, decimal_field decimal(12,2), "
        "arr_field array<int>, struct_field struct<a:string, b:int>"
    )

    def mk(k, tag):
        return Row(
            key=k,
            binary_field=bytes([k % 256, (k + tag) % 256, 3]),
            string_field=f"s{k}-{tag}",
            int32_field=k * 2 + tag,
            int64_field=k * 10_000_000_000 + tag,
            boolean_field=(k + tag) % 2 == 0,
            float_field=float(k) + 0.5,
            double_field=k * 1.25 + tag,
            ts_field=datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=k + tag),
            decimal_field=decimal.Decimal(f"{k}.{tag}0"),
            arr_field=[k, k + 1, tag],
            struct_field=Row(a=f"a{k}", b=k + tag),
        )

    base_rows = [mk(k, 0) for k in range(0, 100, 2)]  # even keys 0..98
    df = spark.createDataFrame(base_rows, schema=schema)
    t = SortedTable.create(
        spark, os.path.join(str(tmp_path), "at"), df, "key", max_records_per_file=16
    )

    upserts = [mk(10, 7), mk(11, 7), mk(98, 7), mk(-4, 7)]  # replace, inserts, head
    deletes = [0, 50, 97]  # head, middle, absent (no-op)
    muts = spark.createDataFrame(
        [Row(**{**r.asDict(), "op": "UPSERT"}) for r in upserts]
        + [Row(**{**mk(k, 0).asDict(), "op": "DELETE"}) for k in deletes],
        schema=schema + ", op string",
    )
    merge_into_table(t, muts)

    got = {r["key"]: r for r in t.read().collect()}
    expected_keys = (set(range(0, 100, 2)) - {0, 50}) | {10, 11, 98, -4}
    assert set(got) == expected_keys
    for r in upserts:
        g = got[r.key]
        assert bytes(g.binary_field) == r.binary_field
        assert g.string_field == r.string_field
        assert g.int64_field == r.int64_field
        assert g.ts_field == r.ts_field
        assert g.decimal_field == r.decimal_field
        assert list(g.arr_field) == r.arr_field
        assert g.struct_field.a == r.struct_field.a and g.struct_field.b == r.struct_field.b
    g = got[2]  # untouched survivor keeps its payload
    assert g.string_field == "s2-0" and g.decimal_field == decimal.Decimal("2.00")


def test_merge_evolves_schema_with_new_column(spark, tmp_path):
    """Additive schema evolution: mutations carrying an extra column
    widen the table; clean files keep their bytes (null-filled on read),
    dirty/new files carry values; time travel sees the old schema."""
    keys = list(range(1000))
    t, base = _mk_table(spark, tmp_path, keys)
    clean_before = {e.name for e in t.manifest().files}

    muts = spark.createDataFrame(
        [Row(key=5, value=b"e" * 20, tag="hot", op="UPSERT"),
         Row(key=2000, value=b"n" * 20, tag="new", op="UPSERT")],
        "key long, value binary, tag string, op string",
    )
    merge_into_table(t, muts)

    df = t.read()
    assert df.columns == ["key", "value", "tag"]
    got = {r.key: r.tag for r in df.filter(F.col("key").isin(5, 2000, 7)).collect()}
    assert got == {5: "hot", 2000: "new", 7: None}
    assert df.count() == 1001
    # untouched files survive by name; old snapshot keeps the old schema
    assert clean_before - {e.name for e in t.manifest().files} != clean_before
    assert t.read(version=0).columns == ["key", "value"]
    # next merge WITHOUT the evolved column is rejected (full-record contract)
    bad = spark.createDataFrame([Row(key=6, value=b"x" * 20, op="UPSERT")],
                                "key long, value binary, op string")
    with pytest.raises(ValueError, match="missing"):
        merge_into_table(t, bad)
    # with it, merging into the evolved table works — including files
    # that predate the evolution (read_schema null-fills them)
    ok = spark.createDataFrame([Row(key=6, value=b"y" * 20, tag=None, op="UPSERT")],
                               "key long, value binary, tag string, op string")
    merge_into_table(t, ok, allow_splice=False)
    assert t.read().filter(F.col("key") == 6).first().value == b"y" * 20


def test_delete_where_predicate(spark, tmp_path):
    from parquet_rewriter_spark.operators.merge import delete_where
    from parquet_rewriter_spark.table import SortedTable
    from pyspark.sql import functions as F

    df = spark.range(0, 10_000).select(
        F.col("id"),
        (F.col("id") % 3).alias("status"),
        (F.col("id") / 10).cast("long").alias("age"),
    )
    t = SortedTable.create(
        spark,
        str(tmp_path / "delw"),
        df,
        key="id",
        max_records_per_file=1_000,
        stats_cols=["age"],
    )
    # SQL-string predicate
    res = delete_where(t, "status = 1 AND id < 2000")
    assert res["files_dirty"] == 2  # victims live in the first two files only
    assert t.read().filter((F.col("status") == 1) & (F.col("id") < 2000)).count() == 0
    assert t.read().count() == 10_000 - 667

    # zone-map-pruned retention sweep: age < 50 → ids < 500 → one file
    res = delete_where(t, F.col("age") < 50, prune={"age": (None, 49)})
    assert res["files_dirty"] == 1
    assert t.read().filter(F.col("age") < 50).count() == 0


def test_merge_check_constraints_reject_before_any_write(spark, sf_dir, tmp_path):
    """A violating UPSERT batch must raise and leave the table version,
    files, and contents untouched; DELETE rows are exempt; a clean
    batch passes through the same gate."""
    import pytest

    from parquet_rewriter_spark.operators.merge import (
        ConstraintViolationError,
        merge_into_table,
    )
    from parquet_rewriter_spark.sources.readers import load_table
    from parquet_rewriter_spark.table import SortedTable

    o = load_table(spark, sf_dir, "orders")
    t = SortedTable.create(spark, str(tmp_path / "chk"), o, key="o_orderkey",
                           max_records_per_file=500)
    v0 = t.manifest().version
    rules = {"price_positive": "o_totalprice > 0",
             "priority_known": "o_orderpriority IS NOT NULL"}

    bad = o.limit(5).withColumn("o_totalprice", F.lit(-1.0)).withColumn(
        "op", F.lit("UPSERT"))
    with pytest.raises(ConstraintViolationError) as ei:
        merge_into_table(t, bad, constraints=rules)
    assert ei.value.violations == {"price_positive": 5}
    assert t.manifest().version == v0  # nothing committed

    # DELETE rows skip payload checks even with absurd payload values
    dels = o.limit(3).withColumn("o_totalprice", F.lit(-1.0)).withColumn(
        "op", F.lit("DELETE"))
    res = merge_into_table(t, dels, constraints=rules)
    assert res["version"] == v0 + 1

    ok = o.limit(4).withColumn("o_totalprice", F.lit(9.5)).withColumn(
        "op", F.lit("UPSERT"))
    res = merge_into_table(t, ok, constraints=rules)
    assert res["version"] == v0 + 2


def test_splice_raw_appends_clean_row_groups_byte_identical(spark, tmp_path):
    """The raw splice path (parquet-java appendRowGroup via py4j) must
    copy every untouched row group's compressed bytes VERBATIM — the
    reference's ParquetRewriter.java:317 contract, not just
    content-equivalence."""
    import pyarrow.parquet as pq

    t, base = _mk_multi_rg_table(spark, tmp_path)
    orig = os.path.join(t.path, "part-base.parquet")
    with open(orig, "rb") as f:
        orig_bytes = f.read()
    orig_md = pq.ParquetFile(orig).metadata

    res = merge_into_table(t, _mutations_df(spark, {555: b"z" * 20}, set()))
    assert res["path"] == "rowgroup_splice", res
    assert res.get("files_raw_appended") == 1, res

    newf = os.path.join(t.path, t.manifest().files[0].name)
    new_md = pq.ParquetFile(newf).metadata
    with open(newf, "rb") as f:
        new_bytes = f.read()
    assert new_md.num_row_groups == orig_md.num_row_groups

    # per-COLUMN-chunk comparison: appendRowGroup packs chunks
    # contiguously, so inter-chunk gaps the source writer left (page
    # index blocks) don't survive — the chunk bytes themselves must
    for rg in range(orig_md.num_row_groups):
        if rg == 5:
            continue  # the one rewritten group (key 555)
        for ci in range(orig_md.num_columns):
            ca = orig_md.row_group(rg).column(ci)
            cb = new_md.row_group(rg).column(ci)
            sa = ca.dictionary_page_offset or ca.data_page_offset
            sb = cb.dictionary_page_offset or cb.data_page_offset
            assert ca.total_compressed_size == cb.total_compressed_size, (rg, ci)
            la = ca.total_compressed_size
            assert orig_bytes[sa:sa + la] == new_bytes[sb:sb + la], (
                f"rg {rg} col {ci}: bytes differ"
            )


def test_invalid_op_values_raise(spark, tmp_path):
    """A typo'd op ("delete", "D") must raise, not silently upsert —
    on BOTH the distributed path (in-plan raise_error) and the splice
    path (driver-side check)."""
    import pytest

    t, _ = _mk_multi_rg_table(spark, tmp_path)
    bad = spark.createDataFrame([(5, b"x" * 20, "delete")],
                                "key long, value binary, op string")
    with pytest.raises(Exception, match="invalid mutation op"):
        merge_into_table(t, bad, allow_splice=False)
    with pytest.raises(Exception, match="invalid mutation op"):
        merge_into_table(t, bad)  # splice path
    # table untouched either way
    assert t.read().count() == 1000


def test_pure_insert_batch_with_duplicate_keys_dedupes(spark, tmp_path):
    """A batch inserting the SAME new key twice must land exactly one
    row (regression: the pure-insert branch previously skipped the
    window dedup and inserted both)."""
    t, base = _mk_table(spark, tmp_path, list(range(100)))
    dup = spark.createDataFrame(
        [(5000, b"a" * 20, "UPSERT"), (5000, b"b" * 20, "UPSERT")],
        "key long, value binary, op string",
    )
    res = merge_into_table(t, dup)
    assert res["files_dirty"] == 0  # pure insert
    rows = t.read().filter("key = 5000").collect()
    assert len(rows) == 1
    assert t.read().count() == 101


def test_seq_col_resolves_duplicates_by_cdc_order(spark, tmp_path):
    """merge_into_table(seq_col=...): a batch carrying several versions
    of a key applies the HIGHEST sequence — CDC-offset semantics — on
    both the dirty path (existing key) and the pure-insert path."""
    t, base = _mk_table(spark, tmp_path, list(range(100)))
    muts = spark.createDataFrame(
        [
            (50, b"v1" + b"x" * 18, "UPSERT", 1),   # existing key, seq 1
            (50, b"v2" + b"x" * 18, "UPSERT", 2),   # ...overridden by seq 2
            (7000, b"n1" + b"x" * 18, "UPSERT", 10),
            (7000, None, "DELETE", 11),             # delete wins by seq
            (8000, None, "DELETE", 1),
            (8000, b"n2" + b"x" * 18, "UPSERT", 2),  # insert wins by seq
        ],
        "key long, value binary, op string, seq long",
    )
    merge_into_table(t, muts, seq_col="seq")
    got = {r["key"]: bytes(r["value"]) for r in
           t.read().filter("key in (50, 7000, 8000)").collect()}
    assert got[50].startswith(b"v2")
    assert 7000 not in got          # the seq-11 DELETE won
    assert got[8000].startswith(b"n2")
    assert t.read().count() == 100 + 1  # 8000 inserted, 7000 net no-op
    # seq column is ordering metadata, not schema evolution
    assert "seq" not in t.read().columns


def test_update_where_rewrites_only_victim_files(spark, tmp_path, sf_dir):
    from parquet_rewriter_spark.operators.merge import update_where
    from parquet_rewriter_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders")
    t = SortedTable.create(
        spark, str(tmp_path / "upd"), orders, key="o_orderkey",
        max_records_per_file=200,
    )
    total = len(t.manifest().files)
    res = update_where(
        t, F.col("o_orderkey") < 100,
        {"o_totalprice": F.col("o_totalprice") * 2},
    )
    assert 0 < res["files_dirty"] < total

    exp = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") < 100, F.col("o_totalprice") * 2)
        .otherwise(F.col("o_totalprice")),
    )
    a = t.read().agg(F.count(F.lit(1)), F.round(F.sum("o_totalprice"), 2)).first()
    b = exp.agg(F.count(F.lit(1)), F.round(F.sum("o_totalprice"), 2)).first()
    assert tuple(a) == tuple(b)


def test_update_where_refuses_key_updates(spark, tmp_path, sf_dir):
    from parquet_rewriter_spark.operators.merge import update_where
    from parquet_rewriter_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders")
    t = SortedTable.create(
        spark, str(tmp_path / "updk"), orders, key="o_orderkey",
        max_records_per_file=5000,
    )
    with pytest.raises(ValueError, match="key"):
        update_where(t, F.lit(True), {"o_orderkey": F.col("o_orderkey") + 1})


def test_merge_report_carries_phase_timings_and_io_counters(spark, tmp_path):
    """The reference instruments its rewrite phases with read/write
    counters (ParquetRewriter.java:349-359); merge_into_table exposes
    the same surface at Spark's grain: plan/write/commit wall times and
    rows/bytes read vs written, on BOTH the distributed and the splice
    paths."""
    t, base = _mk_table(spark, tmp_path, range(1_000), max_records_per_file=100)
    keys = ("t_plan_s", "t_write_s", "t_commit_s",
            "rows_read", "bytes_read", "bytes_written")

    muts = _mutations_df(spark, {5: b"x" * 20}, set())
    res = merge_into_table(t, muts, allow_splice=False)
    assert res["path"] == "distributed"
    for k in keys:
        assert k in res, k
        assert res[k] >= 0
    assert res["rows_read"] == 100  # exactly the one dirty file
    assert res["bytes_read"] > 0 and res["bytes_written"] > 0
    # which partitioner ran is part of the report surface: tiny dirty
    # set stays under BUCKET_WRITE_MIN_BYTES -> fused range exchange
    assert res["write_partitioner"] == "range"
    assert res["n_buckets"] is None and res["max_bucket_mutations"] is None

    res2 = merge_into_table(t, _mutations_df(spark, {6: b"y" * 20}, set()))
    assert res2["path"] == "rowgroup_splice"
    for k in keys:
        assert k in res2, k
    assert res2["rows_read"] == 100 and res2["bytes_written"] > 0

    # pure insert: nothing read, something written
    res3 = merge_into_table(
        t, _mutations_df(spark, {10_000: b"z" * 20}, set()), allow_splice=False
    )
    assert res3["rows_read"] == 0 and res3["bytes_read"] == 0
    assert res3["bytes_written"] > 0
    assert res3["write_partitioner"] == "range"  # pure insert samples only muts
