"""DSIR — Data Selection with Importance Resampling (Xie et al.,
NeurIPS 2023): pick pretraining documents whose hashed-n-gram
distribution looks like a TARGET corpus, from a RAW corpus that mostly
doesn't.

Reference scope note: the reference engine (Factual/parquet-rewriter)
has no selection operators at all — this module is part of the
beyond-reference training-data surface, built Spark-first.

The estimator is the paper's: featurize every document into hashed
n-gram counts (unigrams + bigrams over whitespace words, hashed into
``n_buckets`` buckets), fit two smoothed multinomials — p̂_target over
the target slice, p̂_raw over the whole corpus — and score each document
with the log importance weight

    log w(doc) = Σ_{g ∈ ngrams(doc)} [ln p̂_t(b(g)) − ln p̂_r(b(g))]

then resample via the Gumbel-top-k trick so the selection is a true
importance RESAMPLE (∝ softmax of log weights), not a deterministic
argmax that collapses onto near-duplicates of the single most
target-like document.

100-TB shape (why this is two corpus passes and not one):

* pass 1 (fit) — explode n-grams, map-side-combine into per-bucket
  (raw, target) occurrence counts. The shuffle carries ≤ ``n_buckets``
  rows PER MAP PARTITION, the result is ``n_buckets`` rows total, and
  both multinomials come out of ONE aggregate (target counts via a
  conditional sum under the same grouping).
* pass 2 (score) — explode again, broadcast-hash-join the
  ``n_buckets``-row log-ratio relation (a few KB), sum per document.
  The only shuffle is the per-document partial-aggregated sum.

Persisting the exploded (doc, bucket) relation to "save" the second
scan would spill a token-scale intermediate to disk — strictly worse
than re-scanning a columnar text column at 100 TB. The tiny λ-relation
is what gets reused, and it is broadcast.

Everything is engine-portable: the bucket hash is the md5 bridge
(operators/countmin.py:portable_string_hash), the Gumbel noise is
derived from the portable Knuth unit hash (operators/sampling.py), so
the correctness gate replays featurization, fit, scoring, AND the
resample in ANSI SQL.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from parquet_rewriter_spark.operators.countmin import (
    portable_string_hash,
    portable_string_hash_sql,
)
from parquet_rewriter_spark.operators.sampling import (
    portable_unit,
    portable_unit_sql,
)


def _ngram_rows(
    df: DataFrame, id_col: str, text_col: str, keep: list[str] | None = None
) -> DataFrame:
    """One row per n-gram OCCURRENCE (unigrams + bigrams over
    lowercased whitespace words): (id, ng). Pure codegen — split,
    slice, zip, explode — no Python."""
    w = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    words = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in (keep or [])],
        w.alias("__w"),
    )
    n = F.size("__w")
    bigrams = F.zip_with(
        F.slice("__w", 1, n - 1),
        F.slice("__w", 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    ngrams = F.concat("__w", F.when(n >= 2, bigrams).otherwise(F.array()))
    return words.select(
        "id", *(keep or []), F.explode(ngrams).alias("ng")
    )


def dsir_bucket_ratios(
    df: DataFrame,
    text_col: str,
    target: Column,
    n_buckets: int = 512,
    alpha: float = 1.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fit pass: the ``n_buckets``-row relation
    (bucket, raw_cnt, tgt_cnt, log_ratio) with Laplace-``alpha``
    smoothing. ``target`` is a boolean Column over ``df``'s rows
    selecting the target slice; its n-grams are counted by a
    conditional sum inside the SAME aggregate as the raw counts, so the
    fit is one corpus pass. Buckets no n-gram hashed into still appear
    (smoothing gives them mass) via a range outer-join."""
    spark = df.sparkSession
    occ = _ngram_rows(df.withColumn("__t", target), id_col, text_col, keep=["__t"])
    b = F.pmod(portable_string_hash(F.col("ng")), F.lit(n_buckets))
    counts = (
        occ.select(b.alias("bucket"), F.col("__t"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("raw_cnt"),
            F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("tgt_cnt"),
        )
    )
    full = (
        spark.range(n_buckets)
        .select(F.col("id").alias("bucket"))
        .join(counts, "bucket", "left")
        .fillna(0, ["raw_cnt", "tgt_cnt"])
    )
    # totals via a window over the bounded B-row relation keeps the fit
    # a single job; B ≤ a few thousand so the single partition is fine
    from pyspark.sql import Window

    tot = Window.partitionBy()
    pt = (F.col("tgt_cnt") + F.lit(alpha)) / (
        F.sum("tgt_cnt").over(tot) + F.lit(alpha * n_buckets)
    )
    pr = (F.col("raw_cnt") + F.lit(alpha)) / (
        F.sum("raw_cnt").over(tot) + F.lit(alpha * n_buckets)
    )
    return full.select(
        "bucket",
        "raw_cnt",
        "tgt_cnt",
        (F.log(pt) - F.log(pr)).alias("log_ratio"),
    )


def dsir_score_with_ratios(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lam: DataFrame,
    n_buckets: int,
) -> DataFrame:
    """Score ``df`` against a FROZEN λ relation (bucket, log_ratio) —
    the reusable pass 2: train once, score any corpus/stream batch.
    (id, n_ngrams, log_weight); λ is broadcast, the only shuffle is the
    per-document sum (map-side combined)."""
    occ = _ngram_rows(df, id_col, text_col)
    b = F.pmod(portable_string_hash(F.col("ng")), F.lit(n_buckets))
    return (
        occ.select("id", b.alias("bucket"))
        .join(F.broadcast(lam.select("bucket", "log_ratio")), "bucket")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum("log_ratio").alias("log_weight"),
        )
        .withColumnRenamed("id", id_col)
    )


def dsir_log_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    n_buckets: int = 512,
    alpha: float = 1.0,
) -> DataFrame:
    """Score pass: (id, n_ngrams, log_weight) for every document —
    log_weight = Σ over the doc's n-gram occurrences of the fitted
    bucket log-ratio. Fit + score of the same corpus; for train-once
    score-elsewhere (e.g. a stream) use :func:`dsir_bucket_ratios` +
    :func:`dsir_score_with_ratios`."""
    lam = dsir_bucket_ratios(
        df, text_col, target, n_buckets=n_buckets, alpha=alpha, id_col=id_col
    )
    return dsir_score_with_ratios(df, id_col, text_col, lam, n_buckets)


def dsir_resample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    k: int = 20,
    n_buckets: int = 512,
    alpha: float = 1.0,
    temperature: float = 1.0,
    salt: int = 7,
) -> DataFrame:
    """Gumbel-top-k importance resample: key = log_w/T − ln(−ln u) with
    u the portable unit hash of the document id — sampling k documents
    without replacement with P ∝ exp(log_w/T), deterministic AND
    SQL-replayable. Returns (id, n_ngrams, log_weight, gumbel_key)
    ordered by the key; ``TakeOrderedAndProject`` keeps it a top-k
    heap, never a global sort."""
    w = dsir_log_weights(
        df, id_col, text_col, target, n_buckets=n_buckets, alpha=alpha
    )
    u = portable_unit(F.col(id_col), salt=salt)
    key = F.col("log_weight") / F.lit(temperature) - F.log(-F.log(u))
    return (
        w.select(
            id_col,
            "n_ngrams",
            F.round("log_weight", 4).alias("log_weight"),
            F.round(key, 4).alias("gumbel_key"),
        )
        .orderBy(F.col("gumbel_key").desc(), F.col(id_col))
        .limit(k)
    )


# --------------------------------------------------------------- SQL replay


def ngram_occurrences_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB CTE body producing (id, ng) — one row per unigram/bigram
    occurrence, identical to :func:`_ngram_rows`."""
    return f"""
      WITH __words AS (
        SELECT {id_col} AS id,
               list_filter(regexp_split_to_array(lower({text_col}), '\\s+'),
                           w -> w <> '') AS ws
        FROM {table}
      )
      SELECT id, unnest(ws) AS ng FROM __words
      UNION ALL
      SELECT id,
             unnest(list_transform(generate_series(1, len(ws) - 1),
                                   i -> ws[i] || ' ' || ws[i + 1])) AS ng
      FROM __words WHERE len(ws) >= 2
    """


def dsir_bucket_sql(n_buckets: int) -> str:
    """DuckDB bucket expression over an ``ng`` column."""
    h = portable_string_hash_sql("ng")
    return f"(({h}) % {n_buckets} + {n_buckets}) % {n_buckets}"


def gumbel_key_sql(id_expr: str, logw_expr: str, temperature: float, salt: int) -> str:
    u = portable_unit_sql(id_expr, salt=salt)
    return f"({logw_expr}) / {temperature} - ln(-ln({u}))"


__all__ = [
    "dsir_bucket_ratios",
    "dsir_score_with_ratios",
    "dsir_log_weights",
    "dsir_resample",
    "ngram_occurrences_sql",
    "dsir_bucket_sql",
    "gumbel_key_sql",
]
