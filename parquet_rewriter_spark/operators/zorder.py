"""Z-order (Morton-order) layout — multi-column data skipping.

The reference's zone-map pruning (ParquetRewriter.java:239-251,263-283)
is one-dimensional: min/max on THE sort key. Sorting by column A gives
perfect pruning on A and none on B. Z-ordering interleaves the bits of
two (or more) rank-normalized columns into one Morton code and sorts by
that, so each file covers a small hyper-rectangle of (A, B) space —
per-file min/max stay tight on BOTH columns and a filter on either one
prunes files (the same trick Delta/Iceberg OPTIMIZE ZORDER uses).

Spark shape: rank-normalize each column with ntile (bounded 2^bits
buckets, computed per column), interleave bits with JVM-side shiftleft/
bitwiseOR expressions (whole-stage codegen, no Python), then
range-partition + sort by the Morton code. The ntile windows are global
sorts of single columns — at 100 TB replace with approx_percentile
boundaries + width_bucket (no global sort); the interleave and layout
stages are identical.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window, functions as F


def morton_interleave(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (already bucket-
    normalized, non-negative) column into one Morton code — pure
    bitwise expressions, evaluated inside codegen."""
    n = len(cols)
    parts = []
    for b in range(bits):
        for i, c in enumerate(cols):
            # bit b of column i lands at position b*n + i
            parts.append(
                F.shiftleft(F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)), b * n + i)
            )
    return reduce(lambda a, x: a.bitwiseOR(x), parts)


def zorder_by(df: DataFrame, cols: list[str], bits: int = 12) -> DataFrame:
    """Add a ``__z`` Morton-code column over ``cols``.

    Each column is rank-normalized to [0, 2^bits) with ntile — value
    distribution doesn't matter (skew, negatives, arbitrary ranges all
    flatten to uniform bucket ids). ntile is a global single-column
    sort; see module docstring for the approx-boundary scale variant.
    """
    out = df
    bucket_cols = []
    for c in cols:
        bname = f"__zb_{c}"
        out = out.withColumn(
            bname, F.ntile(2 ** bits).over(Window.orderBy(F.col(c))) - 1
        )
        bucket_cols.append(bname)
    out = out.withColumn("__z", morton_interleave([F.col(b) for b in bucket_cols], bits))
    return out.drop(*bucket_cols)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int,
    bits: int = 12,
) -> None:
    """Write ``df`` z-ordered on ``cols`` into ``num_files`` range-
    partitioned files: each file covers a compact (A, B) rectangle, so
    Parquet footer min/max prune on every z-ordered column."""
    (
        zorder_by(df, cols, bits)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
