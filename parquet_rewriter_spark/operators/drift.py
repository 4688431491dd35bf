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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def ks_drift_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    out_group: str = "source",
    out_stat: str = "ks_stat",
    round_digits: int = 6,
) -> DataFrame:
    """Per-group two-sample KS statistic: each group's ``value_col``
    distribution vs the rest of the table. Returns (group, n_group,
    n_rest, ks_stat) — one row per distinct group."""
    gv = df.groupBy(
        F.col(group_col).alias("__g"), F.col(value_col).alias("__v")
    ).agg(F.count(F.lit(1)).alias("__n"))
    # one row per distinct value: total count + per-group count map
    # (groupBy keys make __g unique per __v, so map_from_entries is
    # safe). NULL-group rows count toward every group's "rest" (they
    # stay in __t) but cannot be map keys and get no output row —
    # collect_list drops the null struct the WHEN produces for them.
    per_v = gv.groupBy("__v").agg(
        F.sum("__n").alias("__t"),
        F.map_from_entries(
            F.collect_list(
                F.when(F.col("__g").isNotNull(), F.struct("__g", "__n"))
            )
        ).alias("__m"),
    )
    groups = (
        df.select(F.col(group_col).alias("__g"))
        .filter(F.col(group_col).isNotNull())
        .distinct()
    )
    counts = per_v.crossJoin(F.broadcast(groups)).select(
        "__g",
        "__v",
        F.coalesce(F.col("__m")[F.col("__g")], F.lit(0))
        .cast("double").alias("__ca"),
        (F.col("__t") - F.coalesce(F.col("__m")[F.col("__g")], F.lit(0)))
        .cast("double").alias("__cb"),
    )
    w_tot = Window.partitionBy("__g")
    w_cum = (
        Window.partitionBy("__g")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # totals and running sums share the __g partitioning → one exchange
    cdfs = counts.select(
        "__g",
        (F.sum("__ca").over(w_cum) / F.sum("__ca").over(w_tot)).alias("__fa"),
        (F.sum("__cb").over(w_cum) / F.sum("__cb").over(w_tot)).alias("__fb"),
        F.sum("__ca").over(w_tot).alias("__na"),
        F.sum("__cb").over(w_tot).alias("__nb"),
    )
    return cdfs.groupBy("__g").agg(
        F.max("__na").cast("long").alias("n_group"),
        F.max("__nb").cast("long").alias("n_rest"),
        F.round(F.max(F.abs(F.col("__fa") - F.col("__fb"))), round_digits).alias(
            out_stat
        ),
    ).withColumnRenamed("__g", out_group)
