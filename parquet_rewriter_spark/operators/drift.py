"""Distribution-drift detection: two-sample Kolmogorov–Smirnov over
relational algebra.

A 100 TB corpus is assembled from many sources that silently change —
a crawler update shifts document lengths, a new dump shifts quality
scores. The monitoring primitive is per-slice distribution comparison:
for each slice, the KS statistic D = sup_x |F_slice(x) − F_rest(x)|
between the slice's empirical CDF and the complement's. D is
distribution-free; n·m/(n+m) scaled thresholds give the usual
significance cut.

Relational shape (no sampling, no driver math), sized so the CORPUS is
read once and everything group-quadratic happens on the tiny
distinct-value relation:
1. per-(slice, value) counts — ONE hash aggregate over the raw rows;
   map-side combine collapses duplicates before the exchange, so the
   shuffle carries ≤ |V|·G rows per task, never the corpus;
2. fold those into one row per DISTINCT VALUE carrying the value's
   total and a slice→count map — a second aggregate over the already
   tiny (slice, value) relation;
3. expand by the (tiny, broadcast) slice list — |V|·G rows; each
   slice's count is a map lookup, the complement's count is
   subtraction (rest = total − slice). Expanding the RAW rows instead
   (crossJoin-tag, then aggregate) would push G× the corpus through
   the shuffle for the same integers;
4. empirical CDFs as a running-sum window per slice ordered by value —
   one (tiny) shuffle on the slice key;
5. D = max |F_a − F_b| — a final per-slice aggregate on the SAME
   partitioning.

Ties are handled exactly (CDF evaluated after all equal values), and
every step is integer counts + one double division, so an ANSI oracle
reproduces D bit-for-bit.

NULL handling: NULL GROUPS count toward every group's rest and get no
output row (documented on the shared stage). NULL VALUES: PSI maps
them to the reserved bin −1 (same policy as the sidecar path,
operators/driftstats.py — with no NULLs the bin's floored term is 0);
the CDF statistics (KS, W1) sort NULL first (Spark's NULLS FIRST), so
a NULL-bearing value column should be pre-filtered or pre-coalesced by
the caller — chi-square treats NULL as an ordinary category via the
distinct-value relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Ceiling on the distinct-value relation: every drift statistic routes
# |V| skinny rows through ONE unpartitioned window to learn the group
# list (and PSI's range) in the same single corpus pass. For the
# columns drift is monitored on (lengths, scores binned upstream,
# categories) |V| ≪ corpus and that stage is trivially cheap; for a
# near-unique continuous column |V| ≈ n and the stage would serialize
# the job or OOM one task. Rather than silently crawl, the plan itself
# asserts the bound and fails with the fix (pass ``quantize=``).
MAX_DISTINCT_VALUES = 4_000_000


def _quantized(df: DataFrame, value_col: str, quantize: int | None):
    """Equal-width value quantization for continuous columns: returns
    (df, col) unchanged when ``quantize`` is None, else adds a column
    holding the CENTER of the value's bin among ``quantize`` equal-width
    bins over the column's range — center, not index, so Wasserstein-1
    stays in value units. Costs ONE eager column-pruned min/max pass
    (two scalars to the driver, embedded as literals); the statistic
    then runs on ≤ ``quantize`` distinct values — the documented binned
    approximation (exact for PSI up to bin placement; KS/W1 converge as
    bins shrink). NULL values stay NULL (PSI's reserved −1 bin)."""
    if quantize is None:
        return df, value_col
    if quantize < 2:
        raise ValueError("quantize needs at least 2 bins")
    row = df.agg(
        F.min(value_col).alias("lo"), F.max(value_col).alias("hi")
    ).first()
    if row["lo"] is None or row["lo"] == row["hi"]:
        # all-NULL or constant column: nothing to quantize
        return df, value_col
    lo, hi = float(row["lo"]), float(row["hi"])
    width = (hi - lo) / float(quantize)
    b = F.least(
        F.lit(quantize - 1),
        F.floor((F.col(value_col).cast("double") - F.lit(lo)) / F.lit(width)),
    )
    qcol = f"__q_{value_col}"
    return df.withColumn(
        qcol,
        F.when(
            F.col(value_col).isNotNull(),
            F.lit(lo) + (b + F.lit(0.5)) * F.lit(width),
        ),
    ), qcol


def quantile_edges(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
    max_distinct: int = MAX_DISTINCT_VALUES,
) -> list:
    """EQUAL-FREQUENCY bin edges for drift monitors — the production
    PSI convention (decile bins frozen from a baseline population, so
    every bin starts with ~10% mass and the floor never fires on the
    baseline): edge_j is the exact (j·n/n_bins)-th order statistic of
    the non-NULL values, j = 1..n_bins−1, computed WITHOUT a global
    sort — per-value counts (one map-side-combined corpus pass), a
    cumulative window over the distinct-value relation (|V| skinny
    rows through one task, guarded by ``max_distinct`` exactly like the
    drift statistics), and a driver collect of ≤ n_bins−1 values.
    Duplicate order statistics (heavy values straddling several ranks)
    collapse, so fewer than n_bins−1 edges can return. Everything is
    counting + one float comparison — an ANSI engine replays the edges
    bit-for-bit, which keeps monitors registered from them fully
    oracle-checkable."""
    if n_bins < 2:
        raise ValueError("n_bins must be at least 2")
    vc = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("__v"))
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w_all = Window.partitionBy()
    w_cum = (
        Window.partitionBy()
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    guard = F.assert_true(
        F.count(F.lit(1)).over(w_all) <= F.lit(max_distinct),
        F.lit(
            f"quantile_edges: value column has more than {max_distinct} "
            "distinct values — quantize/round the column first (or "
            "raise max_distinct)"
        ),
    )
    cum = vc.select(
        "__v",
        F.when(guard.isNull(), F.sum("__n").over(w_cum)).alias("__c"),
        F.sum("__n").over(w_all).alias("__N"),
    )
    ranks = F.array(*[
        F.lit(j) * F.col("__N").cast("double") / F.lit(float(n_bins))
        for j in range(1, n_bins)
    ])
    # edge_j = smallest v whose cumulative count reaches rank j —
    # a min-aggregate per crossed rank, no per-rank re-scan
    crossed = cum.select(
        "__v",
        F.explode(
            F.filter(ranks, lambda r: F.col("__c").cast("double") >= r)
        ).alias("__r"),
    )
    rows = (
        crossed.groupBy("__r").agg(F.min("__v").alias("__e"))
        .select("__e").distinct().orderBy("__e").collect()
    )
    return [r["__e"] for r in rows]


def _per_value_group_counts(
    df: DataFrame,
    value_col: str,
    group_col: str,
    max_distinct: int = MAX_DISTINCT_VALUES,
):
    """Shared first stage of every drift statistic: ONE corpus-wide
    hash aggregate to per-(group, value) counts (map-side combine
    collapses duplicates before the exchange), folded to one row per
    DISTINCT VALUE carrying the value's total, a group→count map
    (groupBy keys make the map keys unique), and ``__gs`` — the global
    group list, derived from the maps themselves via an unpartitioned
    window so the CORPUS is scanned exactly once (a separate
    ``df.select(group).distinct()`` relation would re-scan the group
    column corpus-wide just to learn ~G strings; the window moves only
    the |V| distinct-value rows). NULL-group rows count toward every
    group's "rest" (they stay in the total) but cannot be map keys and
    get no output row — collect_list drops the null struct the WHEN
    produces for them.

    The window funnels the whole distinct-value relation through one
    task, so the SAME pass asserts |V| ≤ ``max_distinct`` and fails
    with an actionable message (pass ``quantize=``) instead of
    serializing on a near-unique continuous column — assert_true
    returns NULL on success, so the guard rides the __gs expression
    and costs nothing."""
    gv = df.groupBy(
        F.col(group_col).alias("__g"), F.col(value_col).alias("__v")
    ).agg(F.count(F.lit(1)).alias("__n"))
    per_v = gv.groupBy("__v").agg(
        F.sum("__n").alias("__t"),
        F.map_from_entries(
            F.collect_list(
                F.when(F.col("__g").isNotNull(), F.struct("__g", "__n"))
            )
        ).alias("__m"),
    )
    w_all = Window.partitionBy()
    guard = F.assert_true(
        F.count(F.lit(1)).over(w_all) <= F.lit(max_distinct),
        F.lit(
            f"drift statistics: value column has more than {max_distinct} "
            "distinct values, which would serialize the group-list window "
            "on one task — pass quantize= to bin a continuous column "
            "(or raise max_distinct)"
        ),
    )
    return per_v.withColumn(
        "__gs",
        F.when(
            guard.isNull(),
            F.array_distinct(
                F.flatten(F.collect_set(F.map_keys("__m")).over(w_all))
            ),
        ),
    )


def _group_rest_cdfs(
    df: DataFrame,
    value_col: str,
    group_col: str,
    max_distinct: int = MAX_DISTINCT_VALUES,
) -> DataFrame:
    """Per-(group, distinct value) empirical CDFs of the group (__fa)
    and its complement (__fb), plus per-group totals (__na, __nb) and
    the value itself (__v) — the shared second stage of the
    CDF-distance drift statistics (KS sup-gap, Wasserstein-1 area).
    The explicit re-exchange on the group key after the explode
    restores G-way parallelism the single-partition window pass would
    otherwise swallow; hash(g) satisfies the CDF windows AND every
    downstream per-group aggregate — one exchange."""
    per_v = _per_value_group_counts(df, value_col, group_col, max_distinct)
    counts = per_v.select(
        F.explode("__gs").alias("__g"), "__v", "__t", "__m"
    ).select(
        "__g",
        "__v",
        F.coalesce(F.col("__m")[F.col("__g")], F.lit(0))
        .cast("double").alias("__ca"),
        (F.col("__t") - F.coalesce(F.col("__m")[F.col("__g")], F.lit(0)))
        .cast("double").alias("__cb"),
    ).repartition(F.col("__g"))
    w_tot = Window.partitionBy("__g")
    w_cum = (
        Window.partitionBy("__g")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # totals and running sums share the __g partitioning → one exchange
    return counts.select(
        "__g",
        "__v",
        (F.sum("__ca").over(w_cum) / F.sum("__ca").over(w_tot)).alias("__fa"),
        (F.sum("__cb").over(w_cum) / F.sum("__cb").over(w_tot)).alias("__fb"),
        F.sum("__ca").over(w_tot).alias("__na"),
        F.sum("__cb").over(w_tot).alias("__nb"),
    )


def ks_drift_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    out_group: str = "source",
    out_stat: str = "ks_stat",
    round_digits: int = 6,
    quantize: int | None = None,
    max_distinct: int = MAX_DISTINCT_VALUES,
) -> DataFrame:
    """Per-group two-sample KS statistic: each group's ``value_col``
    distribution vs the rest of the table. Returns (group, n_group,
    n_rest, ks_stat) — one row per distinct group. For near-unique
    continuous columns pass ``quantize=`` (binned KS, see
    :func:`_quantized`) — the shared stage enforces ``max_distinct``
    rather than serializing."""
    df, value_col = _quantized(df, value_col, quantize)
    cdfs = _group_rest_cdfs(df, value_col, group_col, max_distinct)
    return cdfs.groupBy("__g").agg(
        F.max("__na").cast("long").alias("n_group"),
        F.max("__nb").cast("long").alias("n_rest"),
        F.round(F.max(F.abs(F.col("__fa") - F.col("__fb"))), round_digits).alias(
            out_stat
        ),
    ).withColumnRenamed("__g", out_group)


def w1_drift_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    out_group: str = "source",
    out_stat: str = "w1",
    round_digits: int = 6,
    quantize: int | None = None,
    max_distinct: int = MAX_DISTINCT_VALUES,
) -> DataFrame:
    """Per-group Wasserstein-1 (earth-mover) distance vs the rest:
    W₁ = ∫|F_group − F_rest| dx = Σᵢ |F_a(vᵢ) − F_b(vᵢ)|·(vᵢ₊₁ − vᵢ)
    over consecutive distinct values — the magnitude-sensitive
    companion to KS (which only sees the largest gap, not how far mass
    moved). Numeric values only; same one-corpus-pass shared stage and
    CDFs as KS, plus one lead() on the SAME group partitioning.
    ``quantize=`` bins continuous columns to BIN CENTERS, so the area
    stays in value units (binned-W1 approximation)."""
    df, value_col = _quantized(df, value_col, quantize)
    cdfs = _group_rest_cdfs(df, value_col, group_col, max_distinct)
    w_next = Window.partitionBy("__g").orderBy("__v")
    gaps = cdfs.select(
        "__g",
        "__na",
        "__nb",
        (
            F.abs(F.col("__fa") - F.col("__fb"))
            * (F.lead("__v").over(w_next) - F.col("__v")).cast("double")
        ).alias("__area"),
    )
    return gaps.groupBy("__g").agg(
        F.max("__na").cast("long").alias("n_group"),
        F.max("__nb").cast("long").alias("n_rest"),
        # the last value has no successor: lead is NULL, sum skips it
        # (F there is 1 on both sides anyway — zero area)
        F.round(F.sum("__area"), round_digits).alias(out_stat),
    ).withColumnRenamed("__g", out_group)


def chi2_drift_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    out_group: str = "source",
    out_stat: str = "chi2",
    round_digits: int = 4,
    max_distinct: int = MAX_DISTINCT_VALUES,
) -> DataFrame:
    """Per-group chi-square homogeneity statistic vs the rest — the
    CATEGORICAL drift companion (KS needs an ordering, PSI numeric
    bins; chi-square works on any discrete column, e.g. language or
    label mix per source). For group a vs complement b over values v:
    X² = Σ_v (ca−Ea)²/Ea + (cb−Eb)²/Eb with Ea = na·t_v/N — the 2×|V|
    contingency test. dof = |V|−1. Same one-corpus-pass shared stage
    and |V|·G-bounded shuffles as the KS/PSI twins. Returns (group,
    n_group, n_rest, dof, chi2). Categorical by nature, so no
    ``quantize`` — a high-cardinality column hits the ``max_distinct``
    guard, which for chi-square means the test itself is wrong for the
    column."""
    per_v = _per_value_group_counts(df, value_col, group_col, max_distinct)
    counts = per_v.select(
        F.explode("__gs").alias("__g"), "__v", "__t", "__m"
    ).select(
        "__g",
        "__v",
        F.col("__t").alias("__tv"),
        F.coalesce(F.col("__m")[F.col("__g")], F.lit(0))
        .cast("double").alias("__ca"),
        (F.col("__t") - F.coalesce(F.col("__m")[F.col("__g")], F.lit(0)))
        .cast("double").alias("__cb"),
    ).repartition(F.col("__g"))
    w = Window.partitionBy("__g")
    na = F.sum("__ca").over(w)
    nb = F.sum("__cb").over(w)
    ea = na * F.col("__tv") / (na + nb)
    eb = nb * F.col("__tv") / (na + nb)
    terms = counts.select(
        "__g",
        na.alias("__na"),
        nb.alias("__nb"),
        (
            F.pow(F.col("__ca") - ea, F.lit(2)) / ea
            + F.pow(F.col("__cb") - eb, F.lit(2)) / eb
        ).alias("__term"),
    )
    return terms.groupBy("__g").agg(
        F.max("__na").cast("long").alias("n_group"),
        F.max("__nb").cast("long").alias("n_rest"),
        (F.count(F.lit(1)) - 1).alias("dof"),
        F.round(F.sum("__term"), round_digits).alias(out_stat),
    ).withColumnRenamed("__g", out_group)


def psi_drift_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    n_bins: int = 10,
    out_group: str = "source",
    out_stat: str = "psi",
    round_digits: int = 6,
    floor_p: float = 1e-6,
    quantize: int | None = None,
    max_distinct: int = MAX_DISTINCT_VALUES,
) -> DataFrame:
    """Population Stability Index per group vs rest — the production
    model-monitoring staple (PSI < 0.1 stable, 0.1–0.25 moderate,
    > 0.25 major shift): bin the numeric ``value_col`` equal-width over
    the corpus range, then PSI = Σ_bins (p_group − p_rest)·ln(p_group /
    p_rest) with probabilities floored at ``floor_p`` (the standard
    empty-bin guard; keeps the sum finite and the oracle exact).

    Same scale shape as :func:`ks_drift_by_group`: the corpus is read
    ONCE (the shared per-(group, value) aggregate); the range, the
    binning, the G-way expansion, and the bin rollup all run on the
    distinct-value relation. Binning after aggregation — weighting
    distinct values by their counts — gives bit-identical results to
    binning raw rows at none of the cost. ``quantize=`` pre-bins a
    near-unique continuous column before the shared stage (PSI then
    bins the quantized centers — composition is exact up to bin
    placement); without it the stage enforces ``max_distinct``."""
    df, value_col = _quantized(df, value_col, quantize)
    per_v = _per_value_group_counts(df, value_col, group_col, max_distinct)
    # corpus range via the SAME unpartitioned window pass that already
    # derives the group list: a separate `per_v.agg(min,max)` relation
    # would be a second reference to the per_v subtree, and Spark
    # re-executes common subplans — the corpus would be re-scanned just
    # to learn two scalars. The window moves only the distinct-value
    # relation (|V| skinny rows), never corpus rows.
    w_all = Window.partitionBy()
    ranged = per_v.select(
        "__v",
        "__t",
        "__m",
        "__gs",
        F.min("__v").over(w_all).alias("__lo"),
        F.max("__v").over(w_all).alias("__hi"),
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))
    # NULL values get the reserved bin −1 (same policy as the sidecar
    # path, driftstats._bin_expr): a shifted share of missing values is
    # genuine drift, and with no NULLs the bin's floored term is 0
    binned = ranged.select(
        "__t",
        "__m",
        "__gs",
        F.when(F.col("__v").isNull(), F.lit(-1))
        .when(F.col("__hi") == F.col("__lo"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(n_bins - 1),
                F.floor((F.col("__v") - F.col("__lo")) / width),
            )
        )
        .cast("int")
        .alias("__bin"),
    )
    ca0 = F.coalesce(F.col("__m")[F.col("__g")], F.lit(0))
    # hash(g) after the explode restores G-way parallelism (the window
    # pass left one partition) and satisfies the (g, bin) aggregate,
    # the probability windows, and the final per-group aggregate alike
    per_bin = (
        binned.select(F.explode("__gs").alias("__g"), "__bin", "__t", "__m")
        .select(
            "__g", "__bin",
            ca0.alias("__ca0"),
            (F.col("__t") - ca0).alias("__cb0"),
        )
        .repartition(F.col("__g"))
        .groupBy("__g", "__bin")
        .agg(
            F.sum("__ca0").cast("double").alias("__ca"),
            F.sum("__cb0").cast("double").alias("__cb"),
        )
    )
    w = Window.partitionBy("__g")
    probs = per_bin.select(
        "__g",
        F.greatest(F.col("__ca") / F.sum("__ca").over(w), F.lit(floor_p))
        .alias("__pa"),
        F.greatest(F.col("__cb") / F.sum("__cb").over(w), F.lit(floor_p))
        .alias("__pb"),
        F.sum("__ca").over(w).alias("__na"),
        F.sum("__cb").over(w).alias("__nb"),
    )
    return probs.groupBy("__g").agg(
        F.max("__na").cast("long").alias("n_group"),
        F.max("__nb").cast("long").alias("n_rest"),
        F.round(
            F.sum(
                (F.col("__pa") - F.col("__pb"))
                * F.log(F.col("__pa") / F.col("__pb"))
            ),
            round_digits,
        ).alias(out_stat),
    ).withColumnRenamed("__g", out_group)
