"""Blocked matrix-product kernels for EXACT vector similarity at scale.

Exact threshold-pair search and exact kNN join are inherently O(|A|·|B|)
FLOPs — no bucketing can change that when the similarity threshold sits
inside the data's noise floor (measured on the fixtures: the 0.45
near-dup threshold has pairs at 0.449 and 0.452 — zero margin, so an
LSH candidate stage with total recall degenerates to all-pairs). What
CAN change is the plan shape: a row-level ``crossJoin`` materializes
|A|·|B| rows through the shuffle and evaluates an interpreted
higher-order ``aggregate`` per row. The kernels here decompose the
problem into a GRID of (row-chunk × row-chunk) blocks — the classic
distributed block matrix product:

- each side is hash-chunked; a tiny (i, j) block-grid relation is
  broadcast-joined against each side (equi-join on the chunk id, no
  nested loop);
- ``cogroup().applyInPandas`` pairs the two chunks of each block and
  runs ONE numpy/BLAS matmul per block — Arrow-batched, vectorized,
  ~100× the per-row expression path;
- shuffle volume is |A|·C_B + |B|·C_A rows (each side duplicated once
  per opposite-side CHUNK, not per opposite-side ROW);
- block count = C_A·C_B bounds parallelism; chunk size bounds executor
  memory (two chunk matrices + one score block).

Rounding discipline: kernels emit RAW float64 scores with a small
epsilon slack; the final round(4)/threshold/rank happens in Spark
expressions so results stay bit-identical with the previous
expression-based implementation and the DuckDB oracle (numpy rounds
half-to-even; Spark/DuckDB round half-up).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from parquet_rewriter_spark.functions.vector import as_double

# raw-score slack covering everything that could round INTO a 4-decimal
# boundary the Spark-side filter/rank then decides exactly
_ROUND_EPS = 1.1e-4


def _normalized(pdf_vecs: pd.Series) -> np.ndarray:
    X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf_vecs])
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


def _n_chunks(df: DataFrame, chunk_rows: int, n_rows: int | None) -> int:
    n = n_rows if n_rows is not None else df.count()
    return max(1, math.ceil(n / chunk_rows))


def block_self_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    chunk_rows: int = 4096,
    n_rows: int | None = None,
) -> DataFrame:
    """All pairs with cosine >= ``threshold`` (4-decimal rounded), exact,
    as an upper-triangular block grid — each unordered pair is computed
    in exactly one block, by one vectorized matmul.

    Returns (id_a, id_b, cos_sim) with id_a < id_b. ``n_rows`` skips the
    sizing count() when the caller already knows the cardinality.
    """
    from parquet_rewriter_spark.ship import ensure_shipped

    ensure_shipped(df.sparkSession)  # workers unpickle module-level helpers

    spark = df.sparkSession
    c = _n_chunks(df, chunk_rows, n_rows)
    id_t = df.schema[id_col].dataType.simpleString()
    v = df.select(
        F.col(id_col).alias("id"),
        as_double(vec_col).alias("v"),
        F.pmod(F.xxhash64(id_col), F.lit(c)).alias("chunk"),
    )
    grid = spark.createDataFrame(
        [(i, j) for i in range(c) for j in range(i, c)], "i int, j int"
    )
    # toDF re-mints attribute ids — the two grid copies otherwise share
    # exprIds and the cogroup trips the ambiguous-self-join check
    a = (
        v.alias("va")
        .join(F.broadcast(grid.alias("ga")), F.col("va.chunk") == F.col("ga.i"))
        .select("va.id", "va.v", "ga.i", "ga.j")
        .toDF("id", "v", "i", "j")
    )
    b = (
        v.alias("vb")
        .join(F.broadcast(grid.alias("gb")), F.col("vb.chunk") == F.col("gb.j"))
        .select("vb.id", "vb.v", "gb.i", "gb.j")
        .toDF("id", "v", "i", "j")
    )
    raw_floor = threshold - _ROUND_EPS

    def fn(key, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if len(lpdf) == 0 or len(rpdf) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "raw_cos": []})
        i, j = key
        A, B = _normalized(lpdf["v"]), _normalized(rpdf["v"])
        S = A @ B.T
        ai, bi = np.nonzero(S >= raw_floor)
        ida = lpdf["id"].to_numpy()[ai]
        idb = rpdf["id"].to_numpy()[bi]
        if i == j:  # diagonal block: upper triangle only
            keep = ida < idb
        else:  # off-diagonal: all pairs, normalize id order
            keep = np.ones(len(ida), dtype=bool)
        ida, idb, s = ida[keep], idb[keep], S[ai[keep], bi[keep]]
        lo, hi = np.minimum(ida, idb), np.maximum(ida, idb)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "raw_cos": s})

    pairs = (
        a.groupBy("i", "j")
        .cogroup(b.groupBy("i", "j"))
        .applyInPandas(fn, schema=f"id_a {id_t}, id_b {id_t}, raw_cos double")
    )
    return (
        pairs.select("id_a", "id_b", F.round("raw_cos", 4).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def block_topk_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    vec_col: str,
    k: int,
    chunk_rows: int = 4096,
    left_parts: int | None = None,
    n_right_rows: int | None = None,
) -> DataFrame:
    """Exact kNN join: for each left vector, its k nearest right vectors
    by cosine — (left-part × right-chunk) grid, one matmul + per-row
    heap per block, then a global per-left rank over the ≤ C_B·(k+ties)
    survivors. Returns (lid, rid, raw_cos) for the caller to round/rank.
    """
    from parquet_rewriter_spark.ship import ensure_shipped

    ensure_shipped(left.sparkSession)  # workers unpickle module-level helpers

    spark = left.sparkSession
    cb = _n_chunks(right, chunk_rows, n_right_rows)
    ca = left_parts or max(1, spark.sparkContext.defaultParallelism // max(1, cb))
    lid_t = left.schema[left_id].dataType.simpleString()
    rid_t = right.schema[right_id].dataType.simpleString()
    l = left.select(
        F.col(left_id).alias("lid"),
        as_double(vec_col).alias("v"),
        F.pmod(F.xxhash64(left_id), F.lit(ca)).alias("lpart"),
    )
    r = right.select(
        F.col(right_id).alias("rid"),
        as_double(vec_col).alias("v"),
        F.pmod(F.xxhash64(right_id), F.lit(cb)).alias("rchunk"),
    )
    grid = spark.createDataFrame(
        [(i, j) for i in range(ca) for j in range(cb)], "i int, j int"
    )
    a = (
        l.alias("l")
        .join(F.broadcast(grid.alias("gl")), F.col("l.lpart") == F.col("gl.i"))
        .select("l.lid", "l.v", "gl.i", "gl.j")
        .toDF("lid", "v", "i", "j")
    )
    b = (
        r.alias("r")
        .join(F.broadcast(grid.alias("gr")), F.col("r.rchunk") == F.col("gr.j"))
        .select("r.rid", "r.v", "gr.i", "gr.j")
        .toDF("rid", "v", "i", "j")
    )

    def fn(key, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if len(lpdf) == 0 or len(rpdf) == 0:
            return pd.DataFrame({"lid": [], "rid": [], "raw_cos": []})
        A, B = _normalized(lpdf["v"]), _normalized(rpdf["v"])
        S = A @ B.T
        rids = rpdf["rid"].to_numpy()
        out_l, out_r, out_s = [], [], []
        kk = min(k, S.shape[1])
        # per-left local top-k with epsilon slack: keep everything that
        # could still tie with the true k-th after 4-decimal rounding
        kth = np.partition(S, S.shape[1] - kk, axis=1)[:, S.shape[1] - kk]
        for row, lid in enumerate(lpdf["lid"].to_numpy()):
            keep = S[row] >= kth[row] - _ROUND_EPS
            out_l.extend([lid] * int(keep.sum()))
            out_r.extend(rids[keep])
            out_s.extend(S[row][keep])
        return pd.DataFrame({"lid": out_l, "rid": out_r, "raw_cos": out_s})

    return (
        a.groupBy("i", "j")
        .cogroup(b.groupBy("i", "j"))
        .applyInPandas(fn, schema=f"lid {lid_t}, rid {rid_t}, raw_cos double")
    )
