"""Deterministic sampling / dataset-split operators for training-data
pipelines: hash-based train/val/test splits and exact-fraction
stratified samples.

Reproducibility is the contract: a split must assign the same row to
the same bucket on every run, on any cluster size, regardless of
partitioning — so everything here keys off a *deterministic hash of a
stable key column*, never off ``rand()`` (which changes under retry /
re-partitioning) and never off row position.

Two hash families:

- ``portable_unit`` — Knuth multiplicative hashing on integer keys,
  expressible in ANSI SQL (the DuckDB oracle replays it exactly).
  Mixing is adequate for split assignment (the low bits of ``k *
  2654435761 mod 2^64`` are well distributed for sequential keys).
- ``unit_interval`` — xxhash64-based, better mixing, any key type;
  Spark-only (no SQL oracle), preferred in production.

Scale shape: split assignment is a pure projection (no shuffle, no
action — whole-stage codegen). Stratified sampling shuffles once on
the strata columns; per-stratum exact fractions come from a window
count, not a driver-side group enumeration.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# Knuth's multiplicative constant (golden-ratio reciprocal × 2^32)
_KNUTH = 2654435761
_M64 = 2 ** 64


def portable_unit(key: Column | str, salt: int = 0) -> Column:
    """Deterministic value in [0, 1) from an integer key — the ANSI-SQL
    portable family: ``((key % 2^31) * 2654435761 + salt) % 2^32 /
    2^32``. Every intermediate stays below 2^63 (2^31 · 2^31.3 ≈
    2^62.3), so signed BIGINT arithmetic is exact in both Spark and any
    ANSI engine — :func:`portable_unit_sql` is the literal replay.

    For an odd multiplier, ``k ↦ k·C mod 2^32`` is a bijection on the
    low 32 bits, so sequential keys scatter uniformly — adequate for
    split assignment; use :func:`unit_interval` when you need
    avalanche-grade mixing.
    """
    kc = F.col(key) if isinstance(key, str) else key
    k31 = F.pmod(kc.cast("long"), F.lit(2 ** 31))
    bucket = F.pmod(k31 * F.lit(_KNUTH) + F.lit(salt), F.lit(2 ** 32))
    return bucket / F.lit(float(2 ** 32))


def portable_unit_sql(key_expr: str, salt: int = 0) -> str:
    """The exact ANSI-SQL replay of :func:`portable_unit` (DuckDB/ANSI
    ``%`` is signed remainder; key columns in the fixtures are
    non-negative so pmod == %)."""
    return (
        f"((({key_expr}) % 2147483648) * {_KNUTH} + {salt}) % 4294967296"
        f" / 4294967296.0"
    )


def unit_interval(key: Column | str, salt: int = 0) -> Column:
    """xxhash64-based value in [0, 1) — any key type, production-grade
    mixing; not SQL-portable (Spark-only hash family)."""
    h = F.xxhash64(key, F.lit(salt))
    # map signed 64-bit to [0,1): shift into unsigned range via /2 twice
    return (F.shiftrightunsigned(h, 1).cast("double") * 2.0 + (h.bitwiseAND(F.lit(1))).cast("double")) / F.lit(float(_M64))


def hash_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    salt: int = 0,
    portable: bool = True,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test/...) by
    deterministic hash of ``key`` — pure projection, zero shuffles,
    stable under retries and repartitioning.

    ``weights`` maps split name → fraction; fractions must sum to ~1.
    Rows land in splits by cumulative-threshold on the unit hash, so
    enlarging one split keeps every other assignment stable ONLY for
    the splits before it in insertion order — standard contract
    (document your split order).
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = portable_unit(key, salt) if portable else unit_interval(key, salt)
    names = list(weights)
    cum = 0.0
    expr = F.lit(names[-1])
    thresholds: list[tuple[str, float]] = []
    for n in names[:-1]:
        cum += weights[n]
        thresholds.append((n, cum))
    for n, t in reversed(thresholds):
        expr = F.when(u < F.lit(t), F.lit(n)).otherwise(expr)
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    fraction: float,
    key: str,
    salt: int = 0,
    portable: bool = True,
) -> DataFrame:
    """Exact-fraction deterministic sample per stratum: within each
    stratum, rows are ranked by hash(key) and the lowest
    ``ceil(fraction * n_stratum)`` are kept. Unlike ``df.sampleBy``
    (Bernoulli — approximate counts, RNG-seeded per partition), this is
    exact and reproducible: same rows every run.

    One shuffle on the strata columns (window); rank + count run in the
    same window pass. Per-stratum skew is the usual window caveat — a
    single giant stratum serializes through one task; salt the strata
    upstream if one group dominates.
    """
    u = (portable_unit(key, salt) if portable else unit_interval(key, salt)).alias("__u")
    w = Window.partitionBy(*strata)
    ranked = (
        df.withColumn("__u", u)
        .withColumn("__rn", F.row_number().over(w.orderBy(F.col("__u"), F.col(key))))
        .withColumn("__n", F.count(F.lit(1)).over(w))
    )
    return ranked.filter(
        F.col("__rn") <= F.ceil(F.col("__n") * F.lit(fraction))
    ).drop("__u", "__rn", "__n")


def weighted_sample(
    df: DataFrame,
    key: str,
    weight: Column | str,
    k: int,
    salt: int = 0,
    portable: bool = True,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis, IPL 2006): every row draws an exponential arrival time
    ``e = -ln(u) / w`` from its deterministic unit hash ``u`` and the
    ``k`` smallest arrivals win — each row's inclusion probability is
    proportional to its weight, and the draw is reproducible on any
    cluster size (no RNG state, no row order dependence).

    This is the training-mix primitive: sample documents proportional
    to a quality/importance score, exactly k of them, same k on every
    rerun. One TakeOrderedAndProject (per-partition heap + k-row driver
    merge) — no shuffle of the full table, no global sort.

    Non-positive weights are excluded (their arrival time is +inf).
    Returns the sampled rows with the ``__es_key`` arrival time kept
    for auditability.
    """
    wc = F.col(weight) if isinstance(weight, str) else weight
    u = portable_unit(key, salt) if portable else unit_interval(key, salt)
    # u == 0 would make -ln(u) infinite; the hash families emit
    # multiples of 2^-32 in [0,1), so floor u at 2^-33 (keeps ln finite
    # and preserves order within the family's quantization)
    e = -F.log(F.greatest(u, F.lit(2.0 ** -33))) / wc
    return (
        df.filter(wc > 0)
        .withColumn("__es_key", e)
        .orderBy(F.col("__es_key"), F.col(key))
        .limit(k)
    )


def mixture_sample(
    df: DataFrame,
    source_col: str,
    weight_col: str,
    budgets: dict,
    key: str,
    salt: int = 0,
    portable: bool = True,
) -> DataFrame:
    """Token-budgeted mixture sampling — the training-mix step that
    turns "40% web, 30% code, 30% books" into an actual corpus: from
    each source, take documents (in deterministic hash order) until
    that source's ``weight_col`` budget (tokens/chars/bytes) is met.

    Inclusion rule: a doc survives iff the EXCLUSIVE running total of
    earlier picks from its source is still under budget — so each
    source may overshoot by at most one document (the standard
    take-until-budget contract; no doc is split). Sources missing from
    ``budgets`` contribute nothing; a source smaller than its budget is
    taken whole.

    Deterministic and cluster-shape-independent: the per-source order
    is hash(key), not partition order, so the same corpus comes back on
    every rerun — resumable curriculum builds. One shuffle on
    ``source_col`` (window); a single dominant source serializes
    through one task — the usual window-skew caveat (sub-shard such a
    source upstream and give each shard a budget slice).
    """
    u = portable_unit(key, salt) if portable else unit_interval(key, salt)
    pairs: list[Column] = []
    for s, b in budgets.items():
        pairs.extend([F.lit(s), F.lit(float(b))])
    budget = F.create_map(*pairs)[F.col(source_col)]
    w = (
        Window.partitionBy(source_col)
        .orderBy(F.col("__u"), F.col(key))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn("__u", u)
        .withColumn("__cum_before", F.sum(weight_col).over(w))
        .filter(
            budget.isNotNull()
            & (F.coalesce(F.col("__cum_before"), F.lit(0.0)) < budget)
        )
        .drop("__u", "__cum_before")
    )


def mixture_sample_sql(
    key_expr: str, source_expr: str, weight_expr: str, budget_case: str, salt: int = 0
) -> str:
    """ANSI-SQL replay of :func:`mixture_sample`'s survival predicate,
    as a full query fragment: callers embed
    ``WHERE coalesce(cum_before, 0) < ({budget_case})`` over a window
    ``sum({weight_expr}) OVER (PARTITION BY {source_expr} ORDER BY
    {portable_hash}, {key_expr} ROWS BETWEEN UNBOUNDED PRECEDING AND 1
    PRECEDING)``. Returned string is the hash ORDER BY expression."""
    return portable_unit_sql(key_expr, salt)


def weighted_sample_key_sql(key_expr: str, weight_expr: str, salt: int = 0) -> str:
    """ANSI-SQL replay of the Efraimidis–Spirakis arrival time used by
    :func:`weighted_sample` (pair with ORDER BY key, {key_expr} LIMIT k)."""
    u = portable_unit_sql(key_expr, salt)
    return f"-ln(greatest({u}, 1.1641532182693481e-10)) / ({weight_expr})"


def temperature_weights(
    df: DataFrame,
    source_col: str,
    weight_col: str | Column,
    alpha: float = 0.5,
    total_budget: float | None = None,
) -> DataFrame:
    """Temperature-scaled domain mixture weights — the standard recipe
    for rebalancing a multi-source training corpus (the α-sampling of
    multilingual pretraining: raise each source's mass to α < 1 so
    low-resource sources are upsampled relative to their raw share,
    α = 1 keeps the natural mix, α → 0 approaches uniform):

        p_temp(s) = n_s^α / Σ_t n_t^α      (n_s = source token mass)

    Given ``total_budget`` (tokens to draw), each source's allocation
    is ``budget_s = p_temp·T`` and ``epochs_s = budget_s / n_s`` — the
    over/under-sampling factor, the number a data-mix review actually
    reads (epochs ≫ 1 on a small source means it will be repeated that
    many times; pair with :func:`mixture_sample` to materialize the
    draw).

    Scale shape: ONE map-side-combined aggregate to per-source mass
    (the corpus is scanned exactly once — plan-pinned); the
    normalization terms come from an unpartitioned window over the
    |sources|-row result, which is bounded by definition (training
    mixes name curated domains, not unbounded keys — the same bounded-
    relation contract the drift group list carries, there with an
    explicit guard). An aggregate-over-aggregate would instead
    re-execute the per-source subplan and scan the corpus twice.

    Returns (source, n_weight, p_raw, p_temp[, budget, epochs]) with
    p_raw/p_temp rounded 6dp, budget 2dp, epochs 4dp."""
    wc = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    per = df.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(wc).cast("double").alias("n_weight")
    )
    w = Window.partitionBy()
    out = per.select(
        "source",
        "n_weight",
        F.sum("n_weight").over(w).alias("__tot_n"),
        F.sum(F.pow("n_weight", F.lit(float(alpha)))).over(w).alias("__tot_q"),
    ).select(
        "source",
        "n_weight",
        F.round(F.col("n_weight") / F.col("__tot_n"), 6).alias("p_raw"),
        F.round(
            F.pow("n_weight", F.lit(float(alpha))) / F.col("__tot_q"), 6
        ).alias("p_temp"),
        (F.pow("n_weight", F.lit(float(alpha))) / F.col("__tot_q")).alias("__pt"),
    )
    if total_budget is None:
        return out.drop("__pt")
    budget = F.col("__pt") * F.lit(float(total_budget))
    return out.select(
        "source", "n_weight", "p_raw", "p_temp",
        F.round(budget, 2).alias("budget"),
        F.round(budget / F.col("n_weight"), 4).alias("epochs"),
    )


def negative_samples(
    anchors: DataFrame,
    items: DataFrame,
    id_col: str,
    n_items: int,
    k: int,
    reject: Column | None = None,
    oversample: int = 3,
    neg_col: str = "neg_id",
    rank_col: str = "neg_rank",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: pair
    every anchor row with ``k`` pseudo-random items drawn from a
    0..n_items-1 contiguous id space (the contract ``doc_stable_ids``
    establishes), REJECTING candidates the ``reject`` predicate marks as
    positives (same near-dup cluster, same source, the anchor itself —
    any expression over the anchor's and the joined item's columns).

    Candidate j for anchor a is ``knuth_hash(a, salt=j+1) mod n_items``
    — a pure projection, so the draw is identical on every rerun and on
    any cluster shape, and the whole op is replayable in ANSI SQL
    (:func:`portable_unit_sql`'s integer bucket before the unit
    division). Each anchor fans out to ``k·oversample`` candidates; the
    ones surviving rejection keep their salt order and the first ``k``
    win — a window rank per anchor. Self-pairs are always rejected.

    Scale shape: fan-out is a codegen'd generate (no shuffle); fetching
    item attributes is ONE equi shuffle join on the item id (item side
    hashed once, at corpus scale this is the canonical join); the rank
    window shuffles on the anchor id. Anchors with fewer than ``k``
    survivors (pathological reject predicates) come back short —
    callers needing exact-k should raise ``oversample``. The modulo
    draw carries the usual ≤ n_items/2³² bias — irrelevant for
    training negatives.
    """
    a_id = F.col(id_col)
    cands = anchors.select(
        *anchors.columns,
        F.posexplode(
            F.array(*[
                F.pmod(
                    F.pmod(a_id.cast("long"), F.lit(2 ** 31)) * F.lit(_KNUTH)
                    + F.lit(j + 1),
                    F.lit(2 ** 32),
                )
                % F.lit(n_items)
                for j in range(k * oversample)
            ])
        ).alias("__salt", neg_col),
    ).filter(F.col(neg_col) != a_id)
    fetched = cands.join(
        items.withColumnRenamed(id_col, neg_col), neg_col, "inner"
    )
    if reject is not None:
        fetched = fetched.filter(~reject)
    w = Window.partitionBy(a_id).orderBy("__salt")
    return (
        fetched.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
        .drop("__salt")
    )


def negative_candidate_sql(key_expr: str, j: int, n_items: int) -> str:
    """ANSI replay of one :func:`negative_samples` candidate draw."""
    return (
        f"((({key_expr}) % 2147483648) * {_KNUTH} + {j + 1})"
        f" % 4294967296 % {n_items}"
    )
