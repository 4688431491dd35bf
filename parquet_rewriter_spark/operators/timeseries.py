"""Time-series regularization: gap filling + forward fill + funnels.

North-star analytics surface over the ``events`` fixture (the reference
has no time concept at all). Everything here is built-in DataFrame ops:

- ``resample_fill`` — put an irregular per-key event stream onto a
  regular time grid (``sequence`` + explode generates each key's grid
  between its own bounds — no driver-side calendar), aggregate per
  bucket, then forward-fill empty buckets with
  ``last(..., ignorenulls=True)`` over the key's time order. One
  shuffle on the key for the grid join + one window over the same
  partitioning (Catalyst reuses the exchange).
- ``funnel`` — ordered step matching (view → click → purchase):
  per-key minimal timestamps of each step AFTER the previous step's
  match, computed as chained conditional aggregates over ONE hash
  shuffle on the key (collect each step's candidate times per key via
  min/filter aggregates, not joins).

Scale notes: the grid explode emits (span/step) rows per key — bounded
by wall-clock span, not event count; skewed keys (one key with a year
of data at minute grain) produce 525k grid rows, still constant per
key. The funnel's single-shuffle shape beats the textbook 3-join
formulation by 2 exchanges and is immune to step-cardinality skew.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def resample_fill(
    df: DataFrame,
    key: str,
    ts: str,
    step: str,
    aggs: dict[str, Column],
    fill: Sequence[str] = (),
) -> DataFrame:
    """Regularize ``df`` onto a per-key ``step`` grid (e.g. '1 hour').

    ``aggs`` maps output column → aggregate expression evaluated per
    (key, bucket); buckets with no events carry NULL aggregates, except
    columns named in ``fill`` which forward-fill from the key's last
    non-empty bucket. The grid spans each key's own [min, max] bucket
    (no global calendar — a key active for one day costs one day of
    rows).
    """
    bucket = F.date_trunc(_trunc_unit(step), F.col(ts))
    per_bucket = (
        df.withColumn("__bucket", bucket)
        .groupBy(key, "__bucket")
        .agg(*[a.alias(c) for c, a in aggs.items()])
    )
    bounds = per_bucket.groupBy(key).agg(
        F.min("__bucket").alias("__lo"), F.max("__bucket").alias("__hi")
    )
    grid = bounds.select(
        key,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"INTERVAL {step}"))
        ).alias("__bucket"),
    )
    out = grid.join(per_bucket, on=[key, "__bucket"], how="left")
    if fill:
        w = (
            Window.partitionBy(key)
            .orderBy("__bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for c in fill:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.withColumnRenamed("__bucket", "bucket")


def _trunc_unit(step: str) -> str:
    unit = step.strip().split()[-1].rstrip("s").lower()
    allowed = {"minute", "hour", "day", "week", "month"}
    if unit not in allowed:
        raise ValueError(f"unsupported resample step {step!r} (unit {unit!r})")
    return unit


def funnel(
    events: DataFrame,
    key: str,
    ts: str,
    step_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Ordered funnel: per key, the earliest time each step fired
    STRICTLY AFTER the previous step's matched time (step 1 is its
    earliest occurrence overall). Returns one row per key with
    ``t_<i>_<step>`` timestamps (NULL once the chain breaks).

    Plan: ONE shuffle — per (key) collect each step's sorted event
    times as an aggregate array (sort_array ∘ collect_list of the
    step's times only), then resolve the chain with array higher-order
    ``filter``/``element_at`` expressions, all JVM-side codegen. Array
    state per key = that key's event count for the funnel's steps —
    the same bound sessionization carries.
    """
    aggs = [
        F.sort_array(
            F.collect_list(F.when(F.col(step_col) == s, F.col(ts)))
        ).alias(f"__ts_{i}")
        for i, s in enumerate(steps)
    ]
    g = events.filter(F.col(step_col).isin(list(steps))).groupBy(key).agg(*aggs)
    prev: Column | None = None
    out_cols = []
    for i, s in enumerate(steps):
        arr = F.col(f"__ts_{i}")
        if prev is None:
            t = F.try_element_at(arr, F.lit(1))
        else:
            after = F.filter(arr, lambda x: prev.isNotNull() & (x > prev))
            t = F.try_element_at(after, F.lit(1))
        name = f"t_{i + 1}_{s}"
        g = g.withColumn(name, t)
        prev = F.col(name)
        out_cols.append(name)
    return g.select(key, *out_cols)


def funnel_counts(
    events: DataFrame,
    key: str,
    ts: str,
    step_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Funnel summary: how many keys completed each prefix of
    ``steps`` in order. One row per step with its completion count —
    the usual conversion-funnel report."""
    f = funnel(events, key, ts, step_col, steps)
    aggs = [
        F.count(F.col(f"t_{i + 1}_{s}")).alias(f"n_{i + 1}")
        for i, s in enumerate(steps)
    ]
    wide = f.agg(*aggs)
    pairs = [
        F.struct(
            F.lit(i + 1).alias("step"),
            F.lit(s).alias("step_name"),
            F.col(f"n_{i + 1}").alias("n_completed"),
        )
        for i, s in enumerate(steps)
    ]
    return (
        wide.select(F.explode(F.array(*pairs)).alias("r"))
        .select("r.step", "r.step_name", "r.n_completed")
    )


def decayed_agg(
    events: DataFrame,
    key: str,
    ts: str,
    value: str,
    half_life: str = "7 days",
) -> DataFrame:
    """Exponentially-decayed per-key aggregate (recency-weighted score).

    Recommendation/abuse/feature pipelines want "activity, weighted
    toward now": weight(t) = 0.5 ** (age / half_life), measured from
    the newest event in the relation. Two stages, both scale-safe:

    1. reference time = ``max(ts)`` — a 2-phase global aggregate
       producing ONE row, broadcast-joined back (no window, no
       collect);
    2. one hash shuffle on ``key``: sum(value·w), sum(w), count, and
       the age of each key's newest event.

    Decay math is done in double seconds JVM-side; a half-life is the
    natural parameterization (λ = ln2 / half_life) because "7-day
    half-life" is reviewable and unit-safe.
    """
    unit, amount = _parse_duration_s(half_life)
    ref = events.agg(F.max(ts).alias("_ref_ts"))
    age_s = (F.unix_micros(F.col("_ref_ts")) - F.unix_micros(F.col(ts))) / F.lit(1e6)
    w = F.pow(F.lit(0.5), age_s / F.lit(unit * amount))
    return (
        events.join(F.broadcast(ref))
        .groupBy(key)
        .agg(
            F.sum(F.col(value) * w).alias("decayed_sum"),
            F.sum(w).alias("decayed_weight"),
            F.count(F.lit(1)).alias("n_events"),
            F.min(age_s).alias("newest_age_s"),
        )
    )


def _parse_duration_s(spec: str) -> tuple[float, float]:
    """'7 days' → (86400.0, 7.0); supports seconds/minutes/hours/days."""
    amount_s, unit_s = spec.split()
    units = {"second": 1.0, "minute": 60.0, "hour": 3600.0, "day": 86400.0}
    return units[unit_s.rstrip("s")], float(amount_s)


def holt_winters_by(
    df: DataFrame,
    group_col: str,
    time_col: str,
    value_col: str,
    period: int = 12,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    horizon: int = 3,
) -> DataFrame:
    """Additive Holt-Winters (triple exponential smoothing) PER GROUP —
    level + trend + additive seasonality, the classic seasonal
    forecaster — as one codegen fold per series.

    Scale shape: the 100-TB use is millions of INDEPENDENT series
    (per customer / SKU / nation) forecast in parallel, so the plan is
    one hash exchange on the group key, an order-safe array_sort
    collect per group (series length is bounded — it's a time grid,
    not the corpus), and a single ``F.aggregate`` fold carrying
    (level, trend, seasonal array, t) — no Python, no iteration over
    Spark jobs, no per-step shuffles. Groups shorter than 2·period are
    dropped (no seasonal init exists for them).

    Initialization follows the textbook convention: level = mean of
    season 1, trend = (mean of season 2 − mean of season 1)/period,
    seasonals = season-1 deviations. Updates recompute the new level
    expression inside the trend/seasonal updates exactly like the SQL
    replay, so both engines run the identical double-precision
    recurrence. Returns (group, h, yhat, n_points) for h = 1..horizon:
    ŷ(n+h) = level + h·trend + seasonal[(n+h−1) mod period]."""
    P = int(period)
    a, b, g = float(alpha), float(beta), float(gamma)
    oma, omb, omg = 1.0 - a, 1.0 - b, 1.0 - g

    vals = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col(time_col).alias("t"),
                                    F.col(value_col).alias("v")))
        ),
        lambda s: s.v.cast("double"),
    )
    series = (
        df.groupBy(F.col(group_col).alias("grp"))
        .agg(vals.alias("ys"))
        .where(F.size("ys") >= 2 * P)
    )
    ys = F.col("ys")
    n = F.size(ys)
    sum1 = F.aggregate(F.slice(ys, 1, P), F.lit(0.0), lambda acc, y: acc + y)
    sum2 = F.aggregate(F.slice(ys, P + 1, P), F.lit(0.0), lambda acc, y: acc + y)
    l0 = sum1 / P
    b0 = (sum2 - sum1) / float(P * P)
    seas0 = F.transform(F.slice(ys, 1, P), lambda y: y - sum1 / P)
    init = F.struct(
        l0.alias("level"), b0.alias("trend"), seas0.alias("seas"),
        F.lit(P).cast("int").alias("t"),
    )

    def step(acc, y):
        idx = F.pmod(acc.t, F.lit(P))  # 0-based seasonal slot of step t
        s_t = F.element_at(acc.seas, idx + 1)
        lvl_new = F.lit(a) * (y - s_t) + F.lit(oma) * (acc.level + acc.trend)
        # recompute lvl_new inside trend/seas exactly like the SQL replay
        trend_new = F.lit(b) * (lvl_new - acc.level) + F.lit(omb) * acc.trend
        seas_new = F.transform(
            acc.seas,
            lambda s, i: F.when(
                i == idx, F.lit(g) * (y - lvl_new) + F.lit(omg) * s
            ).otherwise(s),
        )
        return F.struct(
            lvl_new.alias("level"), trend_new.alias("trend"),
            seas_new.alias("seas"), (acc.t + 1).alias("t"),
        )

    st = F.aggregate(F.slice(ys, P + 1, n - P), init, step)
    fitted = series.select(
        "grp", n.alias("n_points"), st.alias("st")
    )
    h = F.explode(F.sequence(F.lit(1), F.lit(int(horizon)))).alias("h")
    out = fitted.select("grp", "n_points", "st", h)
    yhat = (
        F.col("st.level")
        + F.col("h") * F.col("st.trend")
        + F.element_at(
            F.col("st.seas"),
            F.pmod(F.col("n_points") + F.col("h") - 1, F.lit(P)) + 1,
        )
    )
    return out.select(
        F.col("grp").alias(group_col), "h", yhat.alias("yhat"), "n_points"
    )


def holt_linear_by(
    df: DataFrame,
    group_col: str,
    time_col: str,
    value_col: str,
    alpha: float = 0.3,
    beta: float = 0.1,
    horizon: int = 3,
) -> DataFrame:
    """Holt's LINEAR-TREND forecaster (double exponential smoothing) —
    the non-seasonal sibling of :func:`holt_winters_by` for series too
    short or too aperiodic for a seasonal fit (that operator drops
    groups under 2·period; this one needs just 2 points): level +
    trend, no seasonal array, as the same ONE-codegen-fold-per-series
    shape. Textbook init l₂=y₂, b₂=y₂−y₁ (so the first update's
    one-step forecast l+b targets y₃ — an l=y₁ init is off by one and
    visibly lags a perfectly linear series), then
    l_t = α·y_t + (1−α)(l+b); b_t = β(l_t−l) + (1−β)b over y₃.., and
    ŷ(n+h) = l + h·b. Both engines run the identical double recurrence
    (grid-rounded inputs recommended). Returns (group, h, yhat,
    n_points)."""
    a, b = float(alpha), float(beta)
    oma, omb = 1.0 - a, 1.0 - b
    vals = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col(time_col).alias("t"),
                                    F.col(value_col).alias("v")))
        ),
        lambda s: s.v.cast("double"),
    )
    series = (
        df.groupBy(F.col(group_col).alias("grp"))
        .agg(vals.alias("ys"))
        .where(F.size("ys") >= 2)
    )
    ys = F.col("ys")
    n = F.size(ys)
    init = F.struct(
        F.element_at(ys, 2).alias("level"),
        (F.element_at(ys, 2) - F.element_at(ys, 1)).alias("trend"),
    )

    def step(acc, y):
        lvl_new = F.lit(a) * y + F.lit(oma) * (acc.level + acc.trend)
        trend_new = F.lit(b) * (lvl_new - acc.level) + F.lit(omb) * acc.trend
        return F.struct(lvl_new.alias("level"), trend_new.alias("trend"))

    st = F.aggregate(F.slice(ys, 3, n - 2), init, step)
    fitted = series.select("grp", n.alias("n_points"), st.alias("st"))
    h = F.explode(F.sequence(F.lit(1), F.lit(int(horizon)))).alias("h")
    out = fitted.select("grp", "n_points", "st", h)
    yhat = F.col("st.level") + F.col("h") * F.col("st.trend")
    return out.select(
        F.col("grp").alias(group_col), "h", yhat.alias("yhat"), "n_points"
    )


def cusum_by(
    df: DataFrame,
    group_col: str,
    time_col: str,
    value_col: str,
    k: float = 0.5,
    h: float = 5.0,
    round_to: int = 4,
) -> DataFrame:
    """Tabular CUSUM change detection per group (Page 1954; the
    non-resetting open-ended form): running one-sided sums
    s⁺_t = max(0, s⁺ + (x_t − μ − k·σ)) and
    s⁻_t = max(0, s⁻ + (μ − x_t − k·σ)), alarming when either exceeds
    h·σ — the standard detector for small persistent mean SHIFTS that
    per-point anomaly flags (3σ residuals) never accumulate. One
    codegen fold per series after a (μ, σ) aggregate; groups
    parallelize on the hash, series arrays are grid-bounded.

    Cross-engine determinism: μ and σ are cross-engine aggregates, so
    they (and each value) round to ``round_to`` BEFORE the fold —
    after that every state is an exact IEEE function of identical grid
    inputs, so sums, flags, and displays are bit-identical with no
    further rounding logic. Single-point groups (σ undefined) drop.
    Returns (group, time, cusum_pos, cusum_neg, alarm)."""
    K, H = float(k), float(h)
    pts = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(time_col).cast("long").alias("t"),
                F.col(value_col).cast("double").alias("v"),
            )
        )
    )
    series = (
        df.groupBy(F.col(group_col).alias("grp"))
        .agg(
            pts.alias("pts"),
            F.round(F.avg(value_col), round_to).alias("mu"),
            F.round(F.stddev_samp(value_col), round_to).alias("sigma"),
        )
        .where(F.col("sigma").isNotNull())
    )
    mu, sig = F.col("mu"), F.col("sigma")
    slack = F.lit(K) * sig
    init = F.struct(
        F.lit(0.0).alias("sp"),
        F.lit(0.0).alias("sn"),
        F.array().cast("array<struct<t:bigint,sp:double,sn:double>>").alias("out"),
    )

    def step(acc, p):
        x = F.round(p.v, round_to)
        sp = F.greatest(F.lit(0.0), acc.sp + ((x - mu) - slack))
        sn = F.greatest(F.lit(0.0), acc.sn + ((mu - x) - slack))
        return F.struct(
            sp.alias("sp"),
            sn.alias("sn"),
            F.concat(
                acc.out,
                F.array(F.struct(p.t.alias("t"), sp.alias("sp"), sn.alias("sn"))),
            ).alias("out"),
        )

    st = F.aggregate(F.col("pts"), init, step)
    out = series.select("grp", "sigma", F.explode(st.out).alias("o"))
    thr = F.lit(H) * F.col("sigma")
    # the states ship RAW: they are bit-identical across engines by
    # construction, while a display round() is NOT engine-portable
    # exactly here — CUSUM states are sums of grid values, i.e. always
    # a hair from a rounding boundary, and DuckDB's multiply-first
    # round() disagrees with Spark's BigDecimal round() on those
    # (observed: 3.3200499999999997 → 3.3201 vs 3.3200)
    return out.select(
        F.col("grp").alias(group_col),
        F.col("o.t").alias(time_col),
        F.col("o.sp").alias("cusum_pos"),
        F.col("o.sn").alias("cusum_neg"),
        ((F.col("o.sp") > thr) | (F.col("o.sn") > thr)).alias("alarm"),
    )


def seasonal_naive_backtest(
    df: DataFrame,
    group_col: str,
    time_col: str,
    value_col: str,
    period: int = 12,
    horizon: int = 3,
) -> DataFrame:
    """Rolling-origin backtest of the SEASONAL-NAIVE baseline —
    ŷ(n+h) = y(n+h−P), last season's same slot — the forecast every
    model must beat before it earns a deploy (a Holt-Winters MAPE
    means nothing without it). Same holdout protocol as
    :func:`holt_winters_backtest`; pure window algebra, no fitting:
    one ranking window splits train/holdout, holdout rows join the
    train point one period back by position. Requires horizon ≤ period;
    groups whose TRAIN prefix is shorter than ``period`` DROP entirely
    (no last-season source exists for every holdout point — averaging
    the few that do would report a partial-coverage metric that looks
    complete). Returns (group, n_train, mape, smape)."""
    H, P = int(horizon), int(period)
    if H > P:
        raise ValueError("seasonal-naive needs horizon <= period")
    w_desc = Window.partitionBy(group_col).orderBy(F.col(time_col).desc())
    w_asc = Window.partitionBy(group_col).orderBy(F.col(time_col))
    w_all = Window.partitionBy(group_col)
    ranked = (
        df.withColumn("__rn", F.row_number().over(w_desc))
        .withColumn("__idx", F.row_number().over(w_asc))
        .withColumn("__n", F.count(F.lit(1)).over(w_all))
    )
    nt = F.col("__n") - H  # train length
    hold = ranked.filter(F.col("__rn") <= H).select(
        F.col(group_col).alias("grp"),
        (F.lit(H) - F.col("__rn") + 1).alias("h"),
        F.col(value_col).cast("double").alias("y"),
        nt.alias("n_train"),
        (nt - P + (F.lit(H) - F.col("__rn") + 1)).alias("__src_idx"),
    )
    src = ranked.select(
        F.col(group_col).alias("grp"),
        F.col("__idx").alias("__src_idx"),
        F.col(value_col).cast("double").alias("yhat"),
    )
    # n_train >= P guarantees every holdout point h=1..H has a source
    # (min __src_idx = n_train - P + 1 >= 1): the metric's denominator
    # is always the full horizon, never a partial average
    j = hold.filter(F.col("n_train") >= P).join(src, ["grp", "__src_idx"])
    err = F.abs(F.col("y") - F.col("yhat"))
    ape = err / F.abs(F.col("y"))
    sape = F.lit(2.0) * err / (F.abs(F.col("y")) + F.abs(F.col("yhat")))
    return (
        j.groupBy("grp")
        .agg(
            F.max("n_train").alias("n_train"),
            F.round(F.avg(ape), 4).alias("mape"),
            F.round(F.avg(sape), 4).alias("smape"),
        )
        .select(F.col("grp").alias(group_col), "n_train", "mape", "smape")
    )


def holt_winters_backtest(
    df: DataFrame,
    group_col: str,
    time_col: str,
    value_col: str,
    period: int = 12,
    horizon: int = 3,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    round_to: int = 2,
) -> DataFrame:
    """ROLLING-ORIGIN BACKTEST for :func:`holt_winters_by` — the
    accuracy measurement every production use of a forecaster starts
    with: hold out each series' LAST ``horizon`` points, fit on the
    prefix, forecast h = 1..horizon, and report per-group MAPE and
    sMAPE against the held-out actuals.

    Pure relational algebra over the existing fold: one ranking
    window splits train/holdout, the train prefix feeds the same
    single-codegen-fold fitter, forecasts join actuals on (group, h),
    and two bounded aggregates produce the metrics — per-series
    parallelism is unchanged (millions of independent series hash
    across the cluster). Forecasts are rounded to ``round_to`` before
    the error arithmetic so both engines difference identical grid
    values. Groups whose TRAIN prefix is shorter than 2·period drop
    (no fit exists). Returns (group, n_train, mape, smape)."""
    H = int(horizon)
    w_desc = Window.partitionBy(group_col).orderBy(F.col(time_col).desc())
    ranked = df.withColumn("__rn", F.row_number().over(w_desc))
    train = ranked.filter(F.col("__rn") > H).drop("__rn")
    hold = ranked.filter(F.col("__rn") <= H).select(
        F.col(group_col).alias("grp"),
        (F.lit(H) - F.col("__rn") + 1).alias("h"),
        F.col(value_col).cast("double").alias("y"),
    )
    fit = holt_winters_by(
        train, group_col, time_col, value_col,
        period=period, alpha=alpha, beta=beta, gamma=gamma, horizon=H,
    )
    j = fit.select(
        F.col(group_col).alias("grp"),
        "h",
        F.round("yhat", round_to).alias("yhat"),
        "n_points",
    ).join(hold, ["grp", "h"])
    err = F.abs(F.col("y") - F.col("yhat"))
    ape = err / F.abs(F.col("y"))
    sape = F.lit(2.0) * err / (F.abs(F.col("y")) + F.abs(F.col("yhat")))
    return (
        j.groupBy("grp")
        .agg(
            F.max("n_points").alias("n_train"),
            F.round(F.avg(ape), 4).alias("mape"),
            F.round(F.avg(sape), 4).alias("smape"),
        )
        .select(F.col("grp").alias(group_col), "n_train", "mape", "smape")
    )


def seasonal_decompose_by(
    df: DataFrame,
    group_col: str,
    time_col: str,
    value_col: str,
    period: int = 24,
    anomaly_k: float = 3.0,
    round_to: int | None = None,
    robust: bool = False,
) -> DataFrame:
    """Classical additive seasonal decomposition per group —
    value = trend + seasonal + remainder — plus seasonally-adjusted
    anomaly flags (|remainder| > k·stddev), all window functions and
    two bounded aggregates: the scale shape is millions of independent
    series decomposed in parallel, each within its own hash partition.

    trend: centered moving average (the even-period convention: a
    2×P window with half-weight endpoints), NULL where the window is
    incomplete. seasonal: per-slot mean of the detrended series
    (slot = row position mod period), centered so the P seasonals sum
    to zero — the slot-means relation is P rows per group, joined
    back. remainder: value − trend − seasonal. is_anomaly: the
    seasonally-adjusted residual exceeds k standard deviations — the
    alert that raw-value thresholds get wrong on seasonal data.
    ``round_to`` rounds trend/seasonal before deriving the residual,
    making every downstream value bit-identical across engines (the
    SQL-replay knob). ``robust=True`` swaps the per-slot mean for the
    per-slot MEDIAN and the k·stddev flag for a MAD-scaled robust z
    (1.4826·MAD): a classical decomposition lets one spike leak
    -spike/n into its whole slot's seasonal AND inflate the stddev
    that judges it — the robust variant flags the spike alone (both
    statistics share Spark's percentile() / DuckDB's percentile_cont
    interpolation, so the replay still hash-matches)."""
    P, half = int(period), int(period) // 2
    even = P % 2 == 0
    v = F.col(value_col).cast("double")
    w_ord = Window.partitionBy(group_col).orderBy(time_col)
    span = Window.partitionBy(group_col).orderBy(time_col).rowsBetween(
        -half, half if even else half
    )
    wsum = F.sum(v).over(span)
    wcnt = F.count(v).over(span)
    if even:
        ends = F.lag(v, half).over(w_ord) + F.lead(v, half).over(w_ord)
        trend = F.when(wcnt == P + 1, (wsum - 0.5 * ends) / P)
    else:
        trend = F.when(wcnt == P, wsum / P)
    base = df.withColumn("__slot", F.pmod(F.row_number().over(w_ord) - 1, F.lit(P)))
    base = base.withColumn("__trend", trend).withColumn("__detr", v - F.col("__trend"))
    slot_stat = (
        F.expr("percentile(__detr, 0.5)") if robust else F.avg("__detr")
    )
    slot_means = base.groupBy(group_col, "__slot").agg(slot_stat.alias("__sm"))
    centers = slot_means.groupBy(group_col).agg(F.avg("__sm").alias("__c"))
    seas = slot_means.join(centers, group_col).select(
        group_col, "__slot", (F.col("__sm") - F.col("__c")).alias("__seasonal")
    )
    out = base.join(seas, [group_col, "__slot"])
    if round_to is not None:
        # derive the residual from ROUNDED operands — ALL THREE: raw
        # window sums differ across engines in the last ulp and can
        # straddle a rounding boundary, and an unrounded v minus two
        # grid values lands arbitrarily close to a rounding midpoint
        # (observed at sf0.01: remainder exactly on k·1e-4 + 5e-5).
        # With every operand on the same decimal grid the difference
        # is bit-identical cross-engine before its final round.
        out = out.withColumn("__trend", F.round("__trend", round_to)).withColumn(
            "__seasonal", F.round("__seasonal", round_to)
        )
        v_eff = F.round(v, round_to)
    else:
        v_eff = v
    out = out.withColumn(
        "__remainder", v_eff - F.col("__trend") - F.col("__seasonal")
    )
    if round_to is not None:
        out = out.withColumn("__remainder", F.round("__remainder", round_to))
    w_grp = Window.partitionBy(group_col)
    if robust:
        # MAD-scaled robust z: a spike inflates stddev (masking itself
        # and its slot); the median absolute deviation doesn't
        med_r = F.expr("percentile(__remainder, 0.5)").over(w_grp)
        out = out.withColumn("__absdev", F.abs(F.col("__remainder") - med_r))
        scale = (
            F.lit(1.4826)
            * F.expr("percentile(__absdev, 0.5)").over(w_grp)
        )
        dev = F.abs(
            F.col("__remainder")
            - F.expr("percentile(__remainder, 0.5)").over(w_grp)
        )
    else:
        scale = F.stddev_samp("__remainder").over(w_grp)
        dev = F.abs(F.col("__remainder"))
    threshold = F.lit(float(anomaly_k)) * scale
    if round_to is not None:
        # The flag itself must be boundary-proof: even with rounded
        # remainders, the THRESHOLD is a cross-engine aggregate
        # (stddev / percentile) whose last-ulp sum-order differences
        # can flip `dev > k*scale` when a residual sits within an ulp
        # of the cutoff. Compare rounded deviation against rounded
        # threshold so both sides are k-decimal grid values in every
        # engine.
        dev = F.round(dev, round_to)
        threshold = F.round(threshold, round_to)
    return (
        out.withColumn(
            "is_anomaly",
            F.when(F.col("__remainder").isNotNull(), dev > threshold),
        )
        .withColumnRenamed("__trend", "trend")
        .withColumnRenamed("__seasonal", "seasonal")
        .withColumnRenamed("__remainder", "remainder")
        .drop("__slot", "__detr", "__absdev")
    )
