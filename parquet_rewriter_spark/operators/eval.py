"""Retrieval-quality evaluation: recall@k, MRR, and nDCG@k of a
retrieved ranking against a ground-truth ranking — the measurement leg
of every ANN / hybrid-search deployment ("how much recall did that
index buy, per query, this week").

Both inputs are relations of (query_id, item_id, rank) — the shape
every retrieval operator here already emits (hyperplane_ann_topk_
portable, bm25_topk + a rank window, cosine_topk) — so evaluation is
pure relational algebra: one equi-join of retrieved against truth on
(query, item), then per-query aggregates. No collect, no Python; at
100 TB of query logs this is two hash shuffles on query_id.

Metrics (binary relevance: an item is relevant iff it appears in the
truth top-k):
- recall@k  = |retrieved ∩ truth| / |truth|
- MRR       = 1 / (rank of the FIRST relevant retrieved item), 0 if none
- nDCG@k    = Σ_{hits} 1/log2(rank+1)  /  Σ_{i=1..|truth|} 1/log2(i+1)

The log2 sums are short left-folds over ≤k terms — the same
evaluation order in Spark's ``aggregate`` and DuckDB's list fold, so
rounded values hash-match cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def retrieval_metrics(
    retrieved: DataFrame,
    truth: DataFrame,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
    rank_col: str = "rnk",
) -> DataFrame:
    """Per-query metrics of ``retrieved`` against ``truth`` (both
    (query, item, rank) relations; ranks 1-based and dense).

    Returns (query_id, n_truth, n_hit, recall_at_k, mrr, ndcg_at_k),
    one row per query present in ``truth`` — a query whose retrieval
    came back empty scores 0 on every metric rather than vanishing.
    All three metrics round to 4dp for cross-engine hash stability."""
    t = truth.select(
        F.col(query_col).alias("__q"), F.col(id_col).alias("__i")
    )
    n_rel = t.groupBy("__q").agg(F.count(F.lit(1)).alias("n_truth"))
    hits = (
        retrieved.select(
            F.col(query_col).alias("__q"),
            F.col(id_col).alias("__i"),
            F.col(rank_col).alias("__r"),
        )
        .join(t, ["__q", "__i"])
        .groupBy("__q")
        .agg(
            F.count(F.lit(1)).alias("n_hit"),
            F.min("__r").alias("__first"),
            F.sum(F.lit(1.0) / F.log2(F.col("__r") + 1)).alias("__dcg"),
        )
    )
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.col("n_truth").cast("int")),
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / F.log2(i.cast("double") + 1),
    )
    return (
        n_rel.join(hits, "__q", "left")
        .select(
            F.col("__q").alias(query_col),
            "n_truth",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_truth"), 4
            ).alias("recall_at_k"),
            F.round(
                F.coalesce(F.lit(1.0) / F.col("__first"), F.lit(0.0)), 4
            ).alias("mrr"),
            F.round(
                F.coalesce(F.col("__dcg"), F.lit(0.0)) / idcg, 4
            ).alias("ndcg_at_k"),
        )
    )
