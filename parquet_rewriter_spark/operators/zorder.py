"""Z-order (Morton-order) layout — multi-column data skipping.

The reference's zone-map pruning (ParquetRewriter.java:239-251,263-283)
is one-dimensional: min/max on THE sort key. Sorting by column A gives
perfect pruning on A and none on B. Z-ordering interleaves the bits of
two (or more) rank-normalized columns into one Morton code and sorts by
that, so each file covers a small hyper-rectangle of (A, B) space —
per-file min/max stay tight on BOTH columns and a filter on either one
prunes files (the same trick Delta/Iceberg OPTIMIZE ZORDER uses).

Spark shape, all scale-safe (nothing funnels through one partition):
1. per column, approximate quantile BOUNDARIES (one aggregation pass,
   driver receives 2^bits-1 doubles — bounded, independent of row count);
2. per row, bucket id = unrolled binary search of the value against the
   literal boundary array — ``bits`` iterations of when/element_at,
   constant-folded array, whole-stage codegen, no shuffle at all;
3. interleave bucket bits into the Morton code with shiftleft/bitwiseOR;
4. range-partition + sort by the code (sampling-based range exchange —
   the only shuffle, and a balanced one).

An earlier version rank-normalized with ``ntile`` over a global
``Window.orderBy(col)`` — one partition per z-ordered column; that shape
is exactly what this module exists to avoid at 100 TB.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import DateType, NumericType, TimestampType


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


def _as_double(df: DataFrame, col: str) -> Column:
    """Numeric view of a z-order column (quantiles need doubles)."""
    dt = df.schema[col].dataType
    if isinstance(dt, NumericType):
        return F.col(col).cast("double")
    if isinstance(dt, TimestampType):
        return F.unix_micros(F.col(col)).cast("double")
    if isinstance(dt, DateType):
        return F.datediff(F.col(col), F.lit("1970-01-01")).cast("double")
    raise TypeError(
        f"zorder_by supports numeric/date/timestamp columns; {col!r} is {dt.simpleString()}"
    )


def _with_bucket_col(
    df: DataFrame, out_col: str, value: Column, boundaries: list[float], bits: int
) -> DataFrame:
    """Bucket id in [0, 2^bits) = count of boundaries < value, via an
    unrolled binary search: ``bits`` when/element_at steps against a
    constant-folded literal array — O(bits) per row, zero shuffles.

    The accumulator is MATERIALIZED as a column between steps: a purely
    functional fold would copy the previous step's tree ~3× per level
    (~3^bits nodes — planner blow-up); per-level withColumn keeps growth
    linear and the whole chain still fuses into one codegen stage.
    """
    arr = F.lit(boundaries)
    vcol = f"{out_col}__v"
    out = df.withColumn(vcol, value).withColumn(out_col, F.lit(0))
    for level in range(bits - 1, -1, -1):
        cand = F.col(out_col) + F.lit(2 ** level)
        # boundary between buckets cand-1 and cand is boundaries[cand-1],
        # i.e. 1-based element_at(arr, cand); strict > keeps the mapping
        # monotone with duplicate boundaries (skew collapses to 1 bucket)
        out = out.withColumn(
            out_col,
            F.when(F.col(vcol) > F.element_at(arr, cand.cast("int")), cand).otherwise(
                F.col(out_col)
            ),
        )
    return out.drop(vcol)


def zorder_by(df: DataFrame, cols: list[str], bits: int = 8, rel_err: float | None = None) -> DataFrame:
    """Add a ``__z`` Morton-code column over ``cols``.

    Each column is rank-normalized to [0, 2^bits) by its approximate
    quantile boundaries — value distribution doesn't matter (skew,
    negatives, arbitrary ranges all flatten to near-uniform bucket ids).
    One aggregation pass computes every column's boundaries; bucket
    assignment is pure codegen (see _with_bucket_col).

    ``bits=8`` → 2^16 cells for two columns: plenty of resolution for
    any realistic file count (the layout's pruning granularity is the
    FILE); higher bits mostly buy slower quantile summaries. ``rel_err``
    defaults to a quarter-bucket (1/2^(bits+2)) — boundary error smaller
    than the bucket width it feeds.
    """
    n_bounds = 2 ** bits - 1
    if rel_err is None:
        rel_err = 1.0 / (2 ** (bits + 2))
    probs = [(i + 1) / (2 ** bits) for i in range(n_bounds)]
    # one Tungsten aggregation computes every column's boundary array
    # (percentile_approx ~2.4× faster than the RDD-path approxQuantile
    # at sf0.1); driver holds cols × (2^bits - 1) doubles — bounded by
    # the bit width, not the data. accuracy ≈ 1/rel_err.
    # rel_err=0 historically meant "exact" for approxQuantile; map it to
    # a high-but-bounded summary size instead of unbounded memory
    accuracy = 65536 if rel_err <= 0 else max(100, int(round(1.0 / rel_err)))
    num = df.select(*[_as_double(df, c).alias(c) for c in cols])
    row = num.agg(
        *[
            F.percentile_approx(c, F.lit(probs), F.lit(accuracy)).alias(c)
            for c in cols
        ]
    ).first()
    all_bounds = [list(row[c]) for c in cols]
    out = df
    bucket_cols = []
    for c, bounds in zip(cols, all_bounds):
        bname = f"__zb_{c}"
        out = _with_bucket_col(out, bname, _as_double(df, c), bounds, bits)
        bucket_cols.append(bname)
    out = out.withColumn("__z", morton_interleave([F.col(b) for b in bucket_cols], bits))
    return out.drop(*bucket_cols)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int,
    bits: int | None = None,
) -> None:
    """Write ``df`` z-ordered on ``cols`` into ``num_files`` range-
    partitioned files: each file covers a compact (A, B) rectangle, so
    Parquet footer min/max prune on every z-ordered column.

    ``bits`` defaults to the smallest width giving ~64 Morton cells per
    output file (clamped to [4, 8]): pruning granularity is the FILE, so
    resolution beyond that buys nothing — measured at sf0.1/16 files,
    bits=5 prunes identically to bits=8 while the quantile summary +
    bucket-search codegen run 4× faster (boundary arrays are plan
    literals, so their size is compile cost on every distinct input).
    """
    if bits is None:
        import math

        bits = min(8, max(4, math.ceil(math.log2(max(num_files, 2) * 64) / len(cols))))
    (
        zorder_by(df, cols, bits)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def hilbert_interleave_2d(x: Column, y: Column, bits: int = 8) -> Column:
    """2-D Hilbert index of (already bucket-normalized) cell
    coordinates — pure bitwise/when expressions, evaluated in codegen.

    Morton's bit-interleave has 'seams': consecutive codes can jump
    across the key space (the curve teleports at power-of-two
    boundaries), so a range-partitioned file can cover two distant
    rectangles. The Hilbert curve is CONTINUOUS — every successive cell
    is an orthogonal neighbor — so equal-size code ranges map to more
    compact regions and footer min/max prune strictly tighter on
    average (Moon et al., "Analysis of the Clustering Properties of the
    Hilbert Space-Filling Curve", TKDE 2001).

    Classic top-down d2xy inverse, unrolled over ``bits`` levels: at
    each level take the quadrant, add its curve offset (s² cells), and
    apply the quadrant's reflection/swap to the remaining low bits.

    NOTE: this purely-functional form duplicates the previous level's
    (x, y) subtrees ~4× per level — fine as a standalone expression at
    small ``bits`` (the algorithm pin in tests uses 4), but inside a
    projection chain CollapseProject substitutes through it and the
    plan explodes (OOMs a default-1g driver at bits≥5). Pipelines use
    :func:`_hilbert_col`, which materializes per-level state as columns
    for linear plan growth.
    """
    xx, yy = x.cast("long"), y.cast("long")
    d = F.lit(0).cast("long")
    for level in range(bits - 1, -1, -1):
        s = F.lit(1 << level).cast("long")
        rx = F.shiftright(xx, level).bitwiseAND(F.lit(1))
        ry = F.shiftright(yy, level).bitwiseAND(F.lit(1))
        d = d + s * s * ((F.lit(3) * rx).bitwiseXOR(ry))
        # rotate the sub-quadrant: if ry==0 (and if rx==1, reflect), swap x/y
        reflect = (ry == 0) & (rx == 1)
        nx = F.when(reflect, s - 1 - xx).otherwise(xx)
        ny = F.when(reflect, s - 1 - yy).otherwise(yy)
        xx, yy = F.when(ry == 0, ny).otherwise(nx), F.when(ry == 0, nx).otherwise(ny)
    return d


def hilbert_by(
    df: DataFrame, cols: list[str], bits: int = 8, rel_err: float | None = None
) -> DataFrame:
    """Add a ``__h`` Hilbert-index column over exactly TWO columns —
    the drop-in alternative to :func:`zorder_by` with tighter locality
    (see hilbert_interleave_2d). Same rank-normalization front end: one
    quantile pass, codegen bucket search, no shuffle."""
    if len(cols) != 2:
        raise ValueError("hilbert_by is 2-D; use zorder_by for other arities")
    n_bounds = 2 ** bits - 1
    if rel_err is None:
        rel_err = 1.0 / (2 ** (bits + 2))
    probs = [(i + 1) / (2 ** bits) for i in range(n_bounds)]
    accuracy = 65536 if rel_err <= 0 else max(100, int(round(1.0 / rel_err)))
    num = df.select(*[_as_double(df, c).alias(c) for c in cols])
    row = num.agg(
        *[F.percentile_approx(c, F.lit(probs), F.lit(accuracy)).alias(c) for c in cols]
    ).first()
    out = df
    bucket_cols = []
    for c in cols:
        bname = f"__hb_{c}"
        out = _with_bucket_col(out, bname, _as_double(df, c), list(row[c]), bits)
        bucket_cols.append(bname)
    out = _hilbert_col(out, "__h", bucket_cols[0], bucket_cols[1], bits)
    return out.drop(*bucket_cols)


def _hilbert_col(df: DataFrame, out_col: str, xcol: str, ycol: str, bits: int) -> DataFrame:
    """Materialized-state Hilbert index: the same xy2d recurrence as
    :func:`hilbert_interleave_2d`, but each level's rotation state is a
    COLUMN, not a nested expression. The purely-functional form
    references the previous level's (x, y) trees four times per level —
    ~4^bits node growth once CollapseProject substitutes through the
    projection chain, which OOMs a default-1g driver at bits≥5 (the
    _with_bucket_col lesson, squared). Per-level withColumn keeps the
    plan linear in ``bits`` and everything still fuses into one codegen
    stage."""
    hx, hy, hh = f"{out_col}__x", f"{out_col}__y", out_col
    rx, ry, nx, ny = (f"{out_col}__rx", f"{out_col}__ry",
                      f"{out_col}__nx", f"{out_col}__ny")
    out = (
        df.withColumn(hx, F.col(xcol).cast("long"))
        .withColumn(hy, F.col(ycol).cast("long"))
        .withColumn(hh, F.lit(0).cast("long"))
    )
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        out = (
            out.withColumn(rx, F.shiftright(F.col(hx), level).bitwiseAND(F.lit(1)))
            .withColumn(ry, F.shiftright(F.col(hy), level).bitwiseAND(F.lit(1)))
        )
        out = out.withColumn(
            hh,
            F.col(hh)
            + F.lit(s * s).cast("long")
            * (F.lit(3) * F.col(rx)).bitwiseXOR(F.col(ry)).cast("long"),
        )
        reflect = (F.col(ry) == 0) & (F.col(rx) == 1)
        out = (
            out.withColumn(nx, F.when(reflect, F.lit(s - 1) - F.col(hx)).otherwise(F.col(hx)))
            .withColumn(ny, F.when(reflect, F.lit(s - 1) - F.col(hy)).otherwise(F.col(hy)))
        )
        out = (
            out.withColumn(hx, F.when(F.col(ry) == 0, F.col(ny)).otherwise(F.col(nx)))
            .withColumn(hy, F.when(F.col(ry) == 0, F.col(nx)).otherwise(F.col(ny)))
        )
    return out.drop(hx, hy, rx, ry, nx, ny)


def hilbert_write(
    df: DataFrame, path: str, cols: list[str], num_files: int,
    bits: int | None = None,
) -> None:
    """:func:`zorder_write` with the Hilbert index — each output file
    covers a CONTIGUOUS curve segment, i.e. one compact connected
    region of (A, B) space."""
    if bits is None:
        import math

        bits = min(8, max(4, math.ceil(math.log2(max(num_files, 2) * 64) / len(cols))))
    (
        hilbert_by(df, cols, bits)
        .repartitionByRange(num_files, F.col("__h"))
        .sortWithinPartitions("__h")
        .drop("__h")
        .write.mode("overwrite")
        .parquet(path)
    )


def _hilbert_nd_col(
    df: DataFrame, out_col: str, coord_cols: list[str], bits: int
) -> DataFrame:
    """N-dimensional Hilbert index via Skilling's transform
    ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004):
    undo the per-level rotations/reflections on the coordinate vector,
    Gray-decode, then bit-interleave the transposed result (the Morton
    combiner!). Everything is bitwise/when column ops with per-level
    state MATERIALIZED as columns — linear plan growth in bits×dims
    (see _hilbert_col for why the functional form is a planner bomb).
    """
    n = len(coord_cols)
    xs = [f"{out_col}__c{i}" for i in range(n)]
    out = df
    for x, c in zip(xs, coord_cols):
        out = out.withColumn(x, F.col(c).cast("long"))
    t = f"{out_col}__t"
    # inverse undo of rotations (coords → transpose), high bit down to 2^1
    for level in range(bits - 1, 0, -1):
        Q = 1 << level
        P = Q - 1
        for i in range(n):
            qset = F.col(xs[i]).bitwiseAND(F.lit(Q)) != 0
            # if bit set: invert low bits of x0; else swap low bits x0<->xi
            out = out.withColumn(
                t, F.col(xs[0]).bitwiseXOR(F.col(xs[i])).bitwiseAND(F.lit(P))
            )
            out = out.withColumn(
                xs[0],
                F.when(qset, F.col(xs[0]).bitwiseXOR(F.lit(P)))
                .otherwise(F.col(xs[0]).bitwiseXOR(F.col(t))),
            )
            out = out.withColumn(
                xs[i],
                F.when(qset, F.col(xs[i]))
                .otherwise(F.col(xs[i]).bitwiseXOR(F.col(t))),
            )
    # Gray encode
    for i in range(1, n):
        out = out.withColumn(xs[i], F.col(xs[i]).bitwiseXOR(F.col(xs[i - 1])))
    # t = accumulated parity of the last coordinate's high bits
    out = out.withColumn(t, F.lit(0).cast("long"))
    for level in range(bits - 1, 0, -1):
        Q = 1 << level
        out = out.withColumn(
            t,
            F.when(
                F.col(xs[n - 1]).bitwiseAND(F.lit(Q)) != 0,
                F.col(t).bitwiseXOR(F.lit(Q - 1)),
            ).otherwise(F.col(t)),
        )
    for i in range(n):
        out = out.withColumn(xs[i], F.col(xs[i]).bitwiseXOR(F.col(t)))
    # transpose-interleave: bit b of coord i lands at position
    # b*n + (n-1-i) — coord 0 carries the MOST significant bits
    parts = []
    for b in range(bits):
        for i in range(n):
            parts.append(
                F.shiftleft(
                    F.shiftright(F.col(xs[i]), b).bitwiseAND(F.lit(1)),
                    b * n + (n - 1 - i),
                )
            )
    code = reduce(lambda a, x: a.bitwiseOR(x), parts)
    return out.withColumn(out_col, code.cast("long")).drop(*xs, t)


def hilbert_nd_by(
    df: DataFrame, cols: list[str], bits: int = 6, rel_err: float | None = None
) -> DataFrame:
    """:func:`hilbert_by` for ANY arity ≥ 2 — adds a ``__h`` Hilbert
    index over the rank-normalized columns via Skilling's transform.
    Default 6 bits/dim: 3 dims → 2^18 cells, plenty at file granularity
    (total index bits = bits × dims must stay < 63)."""
    if len(cols) < 2:
        raise ValueError("hilbert_nd_by needs at least two columns")
    if bits * len(cols) >= 63:
        raise ValueError("bits × dims must stay under 63 (long index)")
    n_bounds = 2 ** bits - 1
    if rel_err is None:
        rel_err = 1.0 / (2 ** (bits + 2))
    probs = [(i + 1) / (2 ** bits) for i in range(n_bounds)]
    accuracy = 65536 if rel_err <= 0 else max(100, int(round(1.0 / rel_err)))
    num = df.select(*[_as_double(df, c).alias(c) for c in cols])
    row = num.agg(
        *[F.percentile_approx(c, F.lit(probs), F.lit(accuracy)).alias(c) for c in cols]
    ).first()
    out = df
    bucket_cols = []
    for c in cols:
        bname = f"__hnb_{c}"
        out = _with_bucket_col(out, bname, _as_double(df, c), list(row[c]), bits)
        bucket_cols.append(bname)
    out = _hilbert_nd_col(out, "__h", bucket_cols, bits)
    return out.drop(*bucket_cols)
