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
