"""Bounded-memory frequency sketches: Space-Saving heavy hitters.

``groupBy(item).count()`` is exact and scales — but its state is
O(distinct items). When the item universe is huge (tokens/URLs/n-grams
across a 100 TB corpus) and only the heavy tail matters, the
Space-Saving summary (Metwally, Agrawal, El Abbadi, ICDT 2005) keeps a
fixed ``capacity`` counters per partition and still guarantees:

    every item with true count > N / capacity survives in the summary,
    and each surviving counter overestimates its item by at most the
    partition's min-counter value (tracked here as ``err``).

Merging per-partition summaries by summing (count, err) preserves the
guarantee (Agarwal et al., "Mergeable Summaries", PODS 2012): after the
merge, item i's true global count lies in [count - err, count].

The distributed plan:
1. one ``mapInPandas`` pass builds a capacity-bounded summary per
   Arrow batch (pure Python dict + heapless eviction, vectorized
   pre-count per batch) — no shuffle, state = capacity rows/partition;
2. one hash agg unions the summaries (sum count, sum err) — the only
   shuffle, over at most capacity × n_partitions rows;
3. candidates = items whose upper bound clears the requested rank —
   then an exact rescore (an isin-pruned scan + groupBy over just
   those items)
   turns the approximate summary into EXACT counts for the reported
   top-k, so the result is oracle-comparable while the full-universe
   groupBy never runs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def space_saving_summary(
    df: DataFrame, item_col: str, capacity: int = 1024
) -> DataFrame:
    """Merged Space-Saving summary: (item, count, err) with
    ``count - err <= true_count <= count`` and every item of true count
    > N/capacity (per partition) present."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        errs: dict = {}
        for pdf in batches:
            # vectorized pre-aggregation of the batch, then stream the
            # distinct (item, cnt) pairs through the bounded summary
            vc = pdf[item_col].value_counts()
            for item, cnt in vc.items():
                if item in counters:
                    counters[item] += cnt
                elif len(counters) < capacity:
                    counters[item] = cnt
                    errs[item] = 0
                else:
                    # evict the min counter; its value becomes the new
                    # item's overestimation error
                    evict = min(counters, key=counters.get)
                    base = counters.pop(evict)
                    errs.pop(evict)
                    counters[item] = base + cnt
                    errs[item] = base
        yield pd.DataFrame(
            {
                "item": list(counters.keys()),
                "count": list(counters.values()),
                "err": [errs[i] for i in counters],
            }
        )

    per_part = df.select(F.col(item_col).alias(item_col)).mapInPandas(
        summarize, schema="item string, count long, err long"
    )
    return per_part.groupBy("item").agg(
        F.sum("count").alias("count"), F.sum("err").alias("err")
    )


def heavy_hitters_topk(
    df: DataFrame, item_col: str, k: int = 20, capacity: int = 1024
) -> DataFrame:
    """Exact top-k items by count, found WITHOUT a full-universe groupBy:
    Space-Saving candidates → exact rescore of candidates only.

    The candidate cut keeps every item whose upper bound (count) reaches
    the k-th largest lower bound (count - err) — a superset of the true
    top-k whenever the summary's guarantee holds (capacity ≫ k; with
    Zipf-ish data, capacity ≈ 8–32 × k suffices; pathological flat
    distributions degrade to "top-k among near-ties", which no
    bounded-memory method can rank). Returns (item, n_occurrences) with
    EXACT counts, deterministic tiebreak (count desc, item asc)."""
    # the merged summary is at most capacity × n_partitions rows — a
    # driver-bounded relation, materialized once (one sketch pass)
    rows = space_saving_summary(df, item_col, capacity).collect()
    if not rows:
        return (
            df.groupBy(item_col)
            .agg(F.count(F.lit(1)).alias("n_occurrences"))
            .limit(0)
        )
    lbs = sorted((r["count"] - r["err"] for r in rows), reverse=True)
    kth = lbs[min(k, len(lbs)) - 1]
    cand = [r["item"] for r in rows if r["count"] >= kth]
    return (
        df.filter(F.col(item_col).isin(cand))
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col(item_col))
        .limit(k)
    )
