"""Count-Min sketch: a mergeable, fixed-size frequency summary.

Complements Space-Saving (operators/sketch.py): Space-Saving keeps the
heavy-hitter ITEMS; Count-Min answers point frequency queries for ANY
item from ``depth × width`` counters — state independent of the item
universe, the property that matters when the universe is the token/URL/
n-gram space of a 100 TB corpus (Cormode & Muthukrishnan, "An improved
data stream summary: the count-min sketch and its applications",
J. Algorithms 2005).

Guarantees (depth d, width w, total weight N):

    exact ≤ estimate          (one-sided error — never undercounts)
    estimate ≤ exact + εN     with probability ≥ 1 − δ,
                              ε = e/w,  δ = e^−d

Mergeability: two sketches of identical (depth, width, salt) merge by
counter-wise addition (Agarwal et al., "Mergeable Summaries", PODS
2012) — the relational encoding below makes that a union + sum, so
per-partition / per-day / per-shard sketches roll up associatively.

Relational encoding — the sketch IS a DataFrame ``(j, bucket, cnt)``
with at most d·w rows:

- build: explode each item into its d (row, bucket) cells — a narrow
  codegen'd stage — then ONE hash aggregate on (j, bucket). Map-side
  partial combine collapses the per-partition counters before the
  shuffle, so at most d·w rows per partition move — the shuffle cost of
  the sketch, not of the data.
- lookup: hash the probe items to their d cells, broadcast-join the
  (tiny) sketch, take min over j. No scan of the original corpus.

Hash family: the engine-portable md5 bridge — the low 60 bits of
``md5(item ∥ ':' ∥ j)`` interpreted as an integer, reduced mod width.
md5 exists verbatim in DuckDB/any ANSI engine, so the correctness gate
replays the ENTIRE sketch construction cell-for-cell (unlike xxhash64
sketches, which are rows-only-checkable). Pairwise independence needed
by the CM bound holds per row since md5 mixes the salt through the
whole digest. For a Spark-only hot path, xxhash64(item, j) is ~3×
cheaper; pass ``portable=False``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def portable_string_hash(col: Column | str, salt: int = 0) -> Column:
    """Uniform 60-bit non-negative hash of a string, identical in any
    engine with md5 + hex parsing: Spark ``conv(substr(md5, 1, 15), 16,
    10)`` ≡ DuckDB ``('0x' || substr(md5, 1, 15))::BIGINT``."""
    c = F.col(col) if isinstance(col, str) else col
    salted = F.concat_ws(":", c, F.lit(str(salt))) if salt else c
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def portable_string_hash_sql(expr: str, salt: int = 0) -> str:
    """The DuckDB/ANSI replay of :func:`portable_string_hash`."""
    salted = f"({expr}) || ':' || {salt}" if salt else f"({expr})"
    return f"('0x' || substr(md5({salted}), 1, 15))::BIGINT"


def _bucket(item: Column, j: int, width: int) -> Column:
    return F.pmod(portable_string_hash(item, salt=j + 1), F.lit(width))


def countmin_cells(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 2048,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-row cell projection (j, bucket, __w) — the narrow codegen
    stage shared by the batch build and the streaming aggregation
    (each item fans out to its depth cells; no shuffle here)."""
    item = F.col(item_col)
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    return df.select(
        F.posexplode(
            F.array(*[_bucket(item, j, width) for j in range(depth)])
        ).alias("j", "bucket"),
        w.alias("__w"),
    )


def countmin_build(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 2048,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch relation (j, bucket, cnt) — ≤ depth·width rows.

    ``weight_col`` switches from occurrence counting to weighted sums
    (e.g. byte counts per URL). One wide stage + one hash aggregate.
    On a STREAMING input the same plan is a stateful streaming
    aggregation whose state is bounded at depth·width rows by
    construction — run it in complete mode and the emitted relation IS
    the running sketch (counter sums are order-independent, so the
    drained stream matches the batch sketch cell-for-cell).
    """
    cells = countmin_cells(df, item_col, depth, width, weight_col)
    return cells.groupBy("j", "bucket").agg(F.sum("__w").alias("cnt"))


def countmin_merge(*sketches: DataFrame) -> DataFrame:
    """Counter-wise sum of same-shaped sketches: union + one aggregate."""
    if not sketches:
        raise ValueError("need at least one sketch")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))


def countmin_lookup(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 2048,
    est_col: str = "est",
) -> DataFrame:
    """Point-frequency estimates for every probe row: min over the d
    cells. The sketch (≤ d·w rows) broadcasts; the probe side fans out
    ×depth in codegen — no shuffle beyond the final per-item min."""
    item = F.col(item_col)
    fanned = probes.select(
        "*",
        F.posexplode(
            F.array(*[_bucket(item, j, width) for j in range(depth)])
        ).alias("__j", "__bucket"),
    )
    joined = fanned.join(
        F.broadcast(sketch),
        (F.col("__j") == sketch.j) & (F.col("__bucket") == sketch.bucket),
        "left",
    )
    return (
        joined.groupBy(*probes.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0.0))).alias(est_col))
    )


def countmin_inner_product(a: DataFrame, b: DataFrame) -> DataFrame:
    """AMS/CMS inner-product estimate of Σ_v f_A(v)·f_B(v) — the
    equi-join SIZE of A ⋈ B on the sketched key (with A = B, the second
    frequency moment F₂ = self-join size, the classic skew indicator).

    For each depth row j, Σ_bucket cntA·cntB equals the true inner
    product PLUS non-negative collision terms, so every row
    overestimates and the min over rows is the tightest upper bound —
    the estimate can never undersell a join. This is how a planner
    prices a join from two d·w-cell summaries without touching either
    table: the sketches are kilobytes, the join they describe can be
    billions of rows. Returns one row: ``est`` (double).
    """
    j = a.alias("a").join(
        b.alias("b"),
        (F.col("a.j") == F.col("b.j")) & (F.col("a.bucket") == F.col("b.bucket")),
    )
    per = j.groupBy(F.col("a.j")).agg(
        F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("ip")
    )
    return per.agg(F.min("ip").alias("est"))
