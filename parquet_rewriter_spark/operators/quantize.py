"""8-bit scalar quantization of embedding columns — the storage/IO
shrink step of a large-scale vector pipeline (4 bytes/dim float32 →
1 byte/dim code, 4× smaller scans before any ANN structure is built).

Affine (asymmetric) per-dimension quantization, the ONNX/FAISS
``ScalarQuantizer(QT_8bit)`` shape:

    code_i = clamp(floor((x_i - lo_i) / step_i + 0.5), 0, 255)
    step_i = (hi_i - lo_i) / 255
    x̂_i   = lo_i + code_i · step_i        (dequantize)

with (lo_i, hi_i) calibrated as the per-dimension min/max over a
calibration pass. The round-half-up is written as ``floor(t + 0.5)``
— identical semantics in Spark and ANSI SQL (``round()`` half-even vs
half-away differs between engines; floor does not), which is what
makes the whole construction oracle-replayable: min/max calibration is
exact (order statistics, no float-summation order), and the quantize /
dequantize arithmetic is the same IEEE-double expression tree on both
sides.

Scale shape (100 TB of embeddings):
- calibration is ONE pass: posexplode to (dim, x) with map-side
  combined min/max — the shuffle is dim × partitions rows (KB), and
  the result is a dim-length driver list (the same bounded-driver
  contract as kmeans_centroids);
- quantize/dequantize are pure projections over the array column
  (zip_with against the broadcast-sized calibration literals) — zero
  shuffles, whole-stage codegen, no Python;
- the quantization error is bounded by construction: |x - x̂| ≤
  step/2, so a "within half step" audit is a computable boolean, not
  a tolerance guess.

The codes column is ``array<int>`` holding 0..255; at rest subtract
128 and cast to tinyint for true 1-byte parquet storage (the shift is
metadata, not information).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def calibrate_minmax(df: DataFrame, vec_col: str) -> tuple[list[float], list[float]]:
    """Per-dimension (lo, hi) over the corpus — one posexplode +
    map-side-combined min/max aggregate; only ``dim`` rows reach the
    driver. Returns (lo_list, hi_list), 0-indexed by dimension."""
    rows = (
        df.select(F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "x"))
        .groupBy("i")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .collect()
    )
    by_i = {r["i"]: (r["lo"], r["hi"]) for r in rows}
    dim = max(by_i) + 1
    lo = [float(by_i[i][0]) for i in range(dim)]
    hi = [float(by_i[i][1]) for i in range(dim)]
    return lo, hi


def _lit_arr(xs: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in xs])


def quantize_codes(vec: Column | str, lo: list[float], hi: list[float]) -> Column:
    """``array<int>`` of 0..255 affine codes for a vector column.
    Degenerate dimensions (hi == lo) map to code 0. Pure projection."""
    v = (F.col(vec) if isinstance(vec, str) else vec).cast("array<double>")
    los, his = _lit_arr(lo), _lit_arr(hi)
    paired = F.zip_with(v, los, lambda x, l: F.array(x, l))
    # zip_with is binary; thread hi through a second zip on the pair
    def code(pair: Column, h: Column) -> Column:
        x, l = pair[0], pair[1]
        step = (h - l) / F.lit(255.0)
        raw = F.floor((x - l) / step + F.lit(0.5))
        clamped = F.least(F.greatest(raw, F.lit(0)), F.lit(255))
        return F.when(h == l, F.lit(0)).otherwise(clamped).cast("int")

    return F.zip_with(paired, his, code)


def dequantize(codes: Column | str, lo: list[float], hi: list[float]) -> Column:
    """``array<double>`` reconstruction of a codes column."""
    c = (F.col(codes) if isinstance(codes, str) else codes).cast("array<double>")
    paired = F.zip_with(c, _lit_arr(lo), lambda q, l: F.array(q, l))

    def deq(pair: Column, h: Column) -> Column:
        q, l = pair[0], pair[1]
        return l + q * ((h - l) / F.lit(255.0))

    return F.zip_with(paired, _lit_arr(hi), deq)


def quantize_table(
    df: DataFrame, vec_col: str, lo: list[float], hi: list[float],
    code_col: str = "q8", recon_col: str | None = None,
) -> DataFrame:
    """Adds the codes column (and optionally the dequantized
    reconstruction) — the persistable form. Zero shuffles."""
    out = df.withColumn(code_col, quantize_codes(vec_col, lo, hi))
    if recon_col:
        out = out.withColumn(recon_col, dequantize(code_col, lo, hi))
    return out


def quantization_report(df: DataFrame, vec_col: str, lo: list[float], hi: list[float]) -> DataFrame:
    """Per-dimension audit of the quantization: exact integer code
    aggregates (hash-stable across engines) plus the half-step error
    contract as a computed boolean.

    Returns one row per dimension (1-based, matching SQL array
    indexing): (dim, q_sum, q_min, q_max, within_half_step, lo_r,
    hi_r). ``within_half_step`` is TRUE iff every reconstruction error
    in that dimension is ≤ step/2 + ε — the bound the affine
    construction guarantees, so FALSE anywhere means a broken
    calibration or a drifted corpus, not a tolerance miss."""
    q = quantize_codes(vec_col, lo, hi)
    xhat = dequantize(q, lo, hi)
    v = F.col(vec_col).cast("array<double>")
    err = F.zip_with(v, xhat, lambda x, r: F.abs(x - r))
    exploded = df.select(
        F.posexplode(F.zip_with(q.cast("array<double>"), err, lambda a, b: F.array(a, b))).alias("i0", "pair")
    ).select(
        (F.col("i0") + 1).alias("dim"),
        F.col("pair")[0].cast("long").alias("code"),
        F.col("pair")[1].alias("err"),
    )
    steps = F.array(*[F.lit((h - l) / 255.0) for l, h in zip(lo, hi)])
    # round via F.round (HALF_UP, matching SQL round), not Python round
    # (banker's — diverges from the oracle on exact .5 ties)
    los_r = F.array(*[F.round(F.lit(l), 6) for l in lo])
    his_r = F.array(*[F.round(F.lit(h), 6) for h in hi])
    return (
        exploded.groupBy("dim")
        .agg(
            F.sum("code").alias("q_sum"),
            F.min("code").alias("q_min"),
            F.max("code").alias("q_max"),
            F.max("err").alias("__max_err"),
        )
        .select(
            "dim", "q_sum", "q_min", "q_max",
            (F.col("__max_err")
             <= F.element_at(steps, F.col("dim").cast("int")) / 2 + F.lit(1e-12)
             ).alias("within_half_step"),
            F.element_at(los_r, F.col("dim").cast("int")).alias("lo_r"),
            F.element_at(his_r, F.col("dim").cast("int")).alias("hi_r"),
        )
    )
