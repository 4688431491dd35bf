"""Z-order layout tests: the multi-column data-skipping claim, measured
— per-file min/max ranges on the SECOND column must be materially
tighter than a plain single-column sort produces, while preserving the
data exactly."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from parquet_rewriter_spark.operators.zorder import zorder_by, zorder_write
from parquet_rewriter_spark.sources.readers import load_table


def _coverage(path: str, col: str) -> float:
    """Mean per-file (max-min) span of ``col``, normalized by the global
    span — 1.0 means every file covers the whole value range (no
    pruning possible), small means tight files (good pruning)."""
    spans, mins, maxs = [], [], []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        spans.append(hi - lo)
        mins.append(lo)
        maxs.append(hi)
    global_span = max(maxs) - min(mins)
    return (sum(spans) / len(spans)) / global_span


def test_zorder_tightens_second_column(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    plain = os.path.join(str(tmp_path), "plain")
    zpath = os.path.join(str(tmp_path), "zorder")
    (
        orders.repartitionByRange(8, F.col("o_custkey"))
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite").parquet(plain)
    )
    zorder_write(orders, zpath, ["o_custkey", "o_totalprice"], num_files=8)

    # data preserved exactly
    assert (
        spark.read.parquet(zpath).orderBy("o_orderkey").collect()
        == orders.orderBy("o_orderkey").collect()
    )
    # plain layout: custkey tight, totalprice useless (~full range/file);
    # z-order: BOTH materially tighter than the plain second column
    plain_b = _coverage(plain, "o_totalprice")
    z_b = _coverage(zpath, "o_totalprice")
    z_a = _coverage(zpath, "o_custkey")
    assert plain_b > 0.8, plain_b          # sanity: plain can't prune on B
    assert z_b < plain_b * 0.7, (z_b, plain_b)
    assert z_a < 0.8, z_a                  # A still prunable too


def test_morton_code_orders_rectangles(spark):
    df = spark.createDataFrame(
        [(a, b) for a in range(16) for b in range(16)], "a int, b int"
    )
    # rel_err=0 → exact quantiles: the bijection assertion below needs
    # exact boundaries; the default quarter-bucket error is a layout
    # tolerance, not a bijection guarantee
    z = zorder_by(df, ["a", "b"], bits=4, rel_err=0.0).collect()
    codes = {(r.a, r.b): r["__z"] for r in z}
    assert len(set(codes.values())) == 256  # distinct inputs → distinct codes
    # locality: the four cells of each aligned 2x2 block are contiguous
    block = sorted(codes[(a, b)] for a, b in [(0, 0), (0, 1), (1, 0), (1, 1)])
    assert block == list(range(block[0], block[0] + 4))


def _hilbert_ref(x, y, n):
    """Reference d2xy→d (Wikipedia xy2d) for the correctness pin."""
    rx = ry = 0
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_interleave_matches_reference_and_is_bijective(spark):
    from parquet_rewriter_spark.operators.zorder import hilbert_interleave_2d

    bits = 4
    n = 1 << bits
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x int, y int"
    )
    got = {
        (r.x, r.y): r.h
        for r in grid.withColumn(
            "h", hilbert_interleave_2d(F.col("x"), F.col("y"), bits)
        ).collect()
    }
    ref = {(x, y): _hilbert_ref(x, y, n) for x in range(n) for y in range(n)}
    assert got == ref
    assert sorted(got.values()) == list(range(n * n))  # bijective
    # the materialized-column variant (what pipelines actually run —
    # linear plan growth) must compute the identical index
    from parquet_rewriter_spark.operators.zorder import _hilbert_col

    got2 = {
        (r.x, r.y): r.h for r in _hilbert_col(grid, "h", "x", "y", bits).collect()
    }
    assert got2 == ref


def test_hilbert_is_continuous_morton_is_not(spark):
    """Every consecutive Hilbert index pair must be orthogonal
    NEIGHBORS (step distance 1) — the locality property Morton lacks."""
    from parquet_rewriter_spark.operators.zorder import hilbert_interleave_2d, morton_interleave

    bits = 4
    n = 1 << bits
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x int, y int"
    )
    h = {
        r.h: (r.x, r.y)
        for r in grid.withColumn(
            "h", hilbert_interleave_2d(F.col("x"), F.col("y"), bits)
        ).collect()
    }
    steps = [
        abs(h[i][0] - h[i + 1][0]) + abs(h[i][1] - h[i + 1][1])
        for i in range(n * n - 1)
    ]
    assert set(steps) == {1}
    m = {
        r.m: (r.x, r.y)
        for r in grid.withColumn(
            "m", morton_interleave([F.col("x"), F.col("y")], bits)
        ).collect()
    }
    msteps = [
        abs(m[i][0] - m[i + 1][0]) + abs(m[i][1] - m[i + 1][1])
        for i in range(n * n - 1)
    ]
    assert max(msteps) > 1  # Morton teleports at power-of-two seams


def test_hilbert_write_prunes_box_queries(spark, sf_dir, tmp_path):
    """Hilbert layout: a 2-D box predicate must prune a strict subset
    of files via footer min/max — and never scan more files than an
    unclustered layout."""
    import pyarrow.parquet as pq

    from parquet_rewriter_spark.operators.zorder import hilbert_write

    orders = load_table(spark, sf_dir, "orders")
    p = str(tmp_path / "hil")
    hilbert_write(orders, p, ["o_custkey", "o_totalprice"], num_files=16)
    files = [f for f in os.listdir(p) if f.endswith(".parquet")]
    assert len(files) >= 8
    lo_ck, hi_ck = 0, 200
    lo_tp, hi_tp = 1000.0, 50000.0
    kept = 0
    for f in files:
        md = pq.ParquetFile(os.path.join(p, f)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        keep = False
        for rg in range(md.num_row_groups):
            ck = md.row_group(rg).column(idx["o_custkey"]).statistics
            tp = md.row_group(rg).column(idx["o_totalprice"]).statistics
            if ck.min <= hi_ck and ck.max >= lo_ck and tp.min <= hi_tp and tp.max >= lo_tp:
                keep = True
        kept += keep
    assert kept < len(files)  # the box prunes
    got = (
        spark.read.parquet(p)
        .filter(
            (F.col("o_custkey").between(lo_ck, hi_ck))
            & (F.col("o_totalprice").between(lo_tp, hi_tp))
        )
        .count()
    )
    exp = orders.filter(
        (F.col("o_custkey").between(lo_ck, hi_ck))
        & (F.col("o_totalprice").between(lo_tp, hi_tp))
    ).count()
    assert got == exp


def test_hilbert_nd_is_continuous_and_bijective(spark):
    """Skilling's N-D transform must produce a true Hilbert curve:
    bijective over the grid and CONTINUOUS (consecutive indices are
    orthogonal neighbors, step distance exactly 1) — checked in 3-D,
    and in 2-D for parity with the dedicated 2-D implementation's
    properties."""
    from parquet_rewriter_spark.operators.zorder import _hilbert_nd_col

    for dims, bits in ((2, 4), (3, 3)):
        n = 1 << bits
        import itertools

        pts = list(itertools.product(range(n), repeat=dims))
        cols = [f"c{i}" for i in range(dims)]
        grid = spark.createDataFrame(pts, ", ".join(f"{c} int" for c in cols))
        got = {
            tuple(r[c] for c in cols): r.h
            for r in _hilbert_nd_col(grid, "h", cols, bits).collect()
        }
        assert sorted(got.values()) == list(range(n ** dims)), (dims, bits)
        by_d = {d: p for p, d in got.items()}
        steps = [
            sum(abs(a - b) for a, b in zip(by_d[i], by_d[i + 1]))
            for i in range(n ** dims - 1)
        ]
        assert set(steps) == {1}, (dims, bits)


def test_hilbert_nd_by_three_columns(spark, sf_dir):
    from parquet_rewriter_spark.operators.zorder import hilbert_nd_by

    orders = load_table(spark, sf_dir, "orders")
    out = hilbert_nd_by(orders, ["o_custkey", "o_totalprice", "o_orderkey"], bits=5)
    assert "__h" in out.columns
    n = out.count()
    assert n == orders.count()
    mx = out.agg(F.max("__h")).first()[0]
    assert 0 <= mx < (1 << 15)
