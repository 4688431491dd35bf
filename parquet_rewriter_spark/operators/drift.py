"""Distribution-drift detection: two-sample Kolmogorov–Smirnov over
relational algebra.

A 100 TB corpus is assembled from many sources that silently change —
a crawler update shifts document lengths, a new dump shifts quality
scores. The monitoring primitive is per-slice distribution comparison:
for each slice, the KS statistic D = sup_x |F_slice(x) − F_rest(x)|
between the slice's empirical CDF and the complement's. D is
distribution-free; n·m/(n+m) scaled thresholds give the usual
significance cut.

Relational shape (no sampling, no driver math):
1. tag: every row joins the (tiny, broadcast) slice-key list — fan-out
   = #slices, a constant;
2. per-(slice, value) side counts — ONE hash aggregate over the fanned
   rows (map-side combine collapses duplicates early);
3. empirical CDFs as a running-sum window per slice ordered by value —
   one shuffle on the slice key;
4. D = max |F_a − F_b| — a final per-slice aggregate on the SAME
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
    groups = df.select(F.col(group_col).alias("__g")).distinct()
    tagged = df.crossJoin(F.broadcast(groups)).select(
        "__g",
        F.col(value_col).alias("__v"),
        (F.col(group_col) == F.col("__g")).cast("int").alias("__in"),
    )
    # Pre-partition on the group key alone: hash(g) satisfies the
    # (g, v) aggregate's clustering requirement AND the window's, so the
    # counts agg and the CDF windows share ONE data exchange instead of
    # exchanging on (g, v) and re-exchanging on g.
    counts = tagged.repartition(F.col("__g")).groupBy("__g", "__v").agg(
        F.sum("__in").cast("double").alias("__ca"),
        F.sum(1 - F.col("__in")).cast("double").alias("__cb"),
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
