"""Language-model perplexity quality filter (CCNet-style), relational.

The canonical web-corpus quality gate (CCNet; reused by RedPajama /
Gopher-class pipelines) trains a small n-gram LM on a trusted reference
corpus and buckets every candidate document by its per-token
cross-entropy under that model: low-perplexity "head" docs read like
the reference, high-perplexity "tail" docs are boilerplate/garbled.
CCNet ships a KenLM binary; here the whole thing — training AND
scoring — is relational algebra with STUPID BACKOFF smoothing
(Brants et al. 2007, "Large Language Models in Machine Translation"),
which is the established web-scale choice precisely because it needs
no normalization pass:

    score(w2 | w1) = c(w1 w2) / c(w1)          if c(w1 w2) > 0
                   = alpha * c(w2) / N          else if c(w2) > 0
                   = alpha * 1 / N              else (double OOV)

Plan shape (and the 100 TB story):

- TRAIN: bigrams come from ``zip_with(slice(w,1,n-1), slice(w,2,n-1))``
  — pure codegen array algebra, no self-join, no window — then ONE hash
  aggregation keyed (w1, w2) and one keyed (w); N is a scalar fold.
- SCORE: candidate bigrams shuffle-join the model on its token keys
  (the model may exceed broadcast size at web scale — token-keyed
  shuffle is the shape that survives; Spark broadcasts it on its own
  when small). Per-bigram log-scores are INTEGER-QUANTIZED (micro-nats,
  HALF_UP) before the per-doc fold so the sum is order-free and
  bit-replayable in any engine — the established cross-engine
  discipline for float contributions (SURVEY.md §7).
- BUCKET: CCNet buckets per LANGUAGE (head/middle/tail). The oracled
  path uses an exact ``ntile`` over (ce, doc_id) within each language —
  deterministic and SQL-replayable, but a per-language window is a
  per-language sort (one task per language holds the whole language at
  planner scale). The documented 100-TB path is the engine's existing
  t-digest sidecar (operators/quantile_digest.py): learn the two
  cutoffs per language from the digest, broadcast the |langs|·2-row
  cutoff dim, bucket by pure projection — no global sort anywhere.

Docs with fewer than two tokens have no bigrams and are out of scope
(no cross-entropy is defined for them); callers see them dropped.

North-star surface (SURVEY.md §2.2 LLM table); the reference has no
text ops. Cited public knowledge: Brants et al. 2007; CCNet
(Wenzek et al. 2020).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TOKEN_SEP = " "
QUANT = 1_000_000  # micro-nats: integer-quantized log contributions


def _words(text_col: str) -> F.Column:
    return F.split(F.col(text_col), TOKEN_SEP)


def _bigrams(text_col: str) -> F.Column:
    """array<struct<w1,w2>> of adjacent pairs — codegen, no self-join."""
    return F.expr(
        f"zip_with(slice(split({text_col}, ' '), 1,"
        f"                greatest(size(split({text_col}, ' ')) - 1, 0)),"
        f"         slice(split({text_col}, ' '), 2,"
        f"                greatest(size(split({text_col}, ' ')) - 1, 0)),"
        f"         (a, b) -> struct(a AS w1, b AS w2))"
    )


def train_backoff_lm(
    ref: DataFrame, text_col: str
) -> tuple[DataFrame, DataFrame, int]:
    """Count model from the reference corpus: returns
    ``(uni, bi, n_total)`` where ``uni`` is (w, c) unigram counts,
    ``bi`` is (w1, w2, c12) bigram counts, and ``n_total`` is the
    total reference token count (the backoff denominator). Two hash
    aggregations over one explode each — no other exchange."""
    uni = (
        ref.select(F.explode(_words(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        ref.select(F.explode(_bigrams(text_col)).alias("b"))
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    n_total = int(
        ref.select(F.sum(F.size(_words(text_col))).alias("n")).first()["n"]
        or 0
    )
    return uni, bi, n_total


def score_docs_backoff(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    n_total: int,
    id_col: str,
    text_col: str,
    alpha: float = 0.4,
) -> DataFrame:
    """Per-document cross-entropy under the stupid-backoff bigram LM:
    (id, n_bigrams, ce_micro) where ``ce_micro`` is the mean negative
    log-score in integer micro-nats — each bigram's log-score is
    quantized HALF_UP to micro-nats BEFORE the sum, so the per-doc fold
    is exact integer arithmetic (order-free, engine-portable), and the
    mean is the integer quotient ``(-sum) div n`` (operands positive,
    so Spark ``div`` == DuckDB ``//``). Docs without bigrams drop."""
    if int(n_total) <= 0:
        raise ValueError(
            "score_docs_backoff: empty reference corpus (n_total == 0) — "
            "the backoff denominator is undefined"
        )
    n = float(n_total)
    big = docs.select(
        id_col, F.explode(_bigrams(text_col)).alias("b")
    ).select(id_col, "b.w1", "b.w2")
    scored = (
        big.join(bi, ["w1", "w2"], "left")
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")),
              "w1", "left")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")),
              "w2", "left")
        .select(
            id_col,
            # NB: literals are explicit doubles — Spark SQL parses a
            # bare 0.4 as DECIMAL, and an all-literal DECIMAL/DECIMAL
            # division quantizes the quotient (the double-OOV branch
            # was off by 1e-5 nats before the casts)
            F.expr(
                "CAST(round(ln(CASE"
                "  WHEN c12 IS NOT NULL THEN"
                "    CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)"
                f"  WHEN c2 IS NOT NULL THEN"
                f"    CAST({alpha!r} AS DOUBLE) * CAST(c2 AS DOUBLE)"
                f"      / CAST({n!r} AS DOUBLE)"
                f"  ELSE CAST({alpha!r} AS DOUBLE) / CAST({n!r} AS DOUBLE)"
                f" END) * {QUANT}.0) AS BIGINT)"
            ).alias("q"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.expr("(-sum(q)) div count(1)").alias("ce_micro"),
    )


def perplexity_buckets(
    scored: DataFrame, by_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """CCNet head/middle/tail: adds ``bucket`` = ntile(k) within each
    ``by_col`` group ordered by (ce_micro, id) — exact, deterministic,
    SQL-replayable. Scale caveat (module docstring): a per-group window
    sorts each group in one task; the 100-TB path learns the k-1
    cutoffs from the t-digest sidecar and buckets by broadcast-join
    projection instead."""
    w = Window.partitionBy(by_col).orderBy("ce_micro", id_col)
    return scored.withColumn("bucket", F.ntile(k).over(w))


def _trigrams(text_col: str) -> F.Column:
    """array<struct<w1,w2,w3>> of adjacent triples — codegen indexed
    transform (0-based array indexing), no self-join."""
    return F.expr(
        f"transform(slice(split({text_col}, ' '), 1,"
        f"                 greatest(size(split({text_col}, ' ')) - 2, 0)),"
        f"          (x, i) -> struct(x AS w1,"
        f"                           split({text_col}, ' ')[i + 1] AS w2,"
        f"                           split({text_col}, ' ')[i + 2] AS w3))"
    )


def trigram_counts(ref: DataFrame, text_col: str) -> DataFrame:
    """(w1, w2, w3, c123) counts — the third model level. One explode
    + one hash aggregation, same shape as the bigram level."""
    return (
        ref.select(F.explode(_trigrams(text_col)).alias("t"))
        .select("t.w1", "t.w2", "t.w3")
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c123"))
    )


def score_docs_backoff3(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    tri: DataFrame,
    n_total: int,
    id_col: str,
    text_col: str,
    alpha: float = 0.4,
) -> DataFrame:
    """Per-document cross-entropy under TRIGRAM stupid backoff — the
    production n-gram depth (CCNet ships 5-gram KenLM; the backoff
    chain is identical at any depth):

        S(w3 | w1 w2) = c(w1w2w3) / c(w1w2)        if seen
                      = alpha   · c(w2w3) / c(w2)   else if (w2,w3) seen
                      = alpha^2 · c(w3) / N         else if w3 seen
                      = alpha^2 · 1 / N             else

    Each doc is scored over its n-2 full-context trigram windows
    (docs under three tokens drop — no trigram context exists).
    Same integer micro-nat quantization discipline as the bigram
    scorer; every join is token-keyed (model may exceed broadcast).
    Returns (id, n_trigrams, ce_micro)."""
    if int(n_total) <= 0:
        raise ValueError(
            "score_docs_backoff3: empty reference corpus (n_total == 0) — "
            "the backoff denominator is undefined"
        )
    n = float(n_total)
    tg = docs.select(
        id_col, F.explode(_trigrams(text_col)).alias("t")
    ).select(id_col, "t.w1", "t.w2", "t.w3")
    scored = (
        tg.join(tri, ["w1", "w2", "w3"], "left")
        .join(
            bi.select(
                F.col("w1"), F.col("w2"), F.col("c12").alias("c12a")
            ),
            ["w1", "w2"],
            "left",
        )
        .join(
            bi.select(
                F.col("w1").alias("w2"),
                F.col("w2").alias("w3"),
                F.col("c12").alias("c23"),
            ),
            ["w2", "w3"],
            "left",
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")),
            "w2",
            "left",
        )
        .join(
            uni.select(F.col("w").alias("w3"), F.col("c").alias("c3")),
            "w3",
            "left",
        )
        .select(
            id_col,
            F.expr(
                "CAST(round(ln(CASE"
                "  WHEN c123 IS NOT NULL THEN"
                "    CAST(c123 AS DOUBLE) / CAST(c12a AS DOUBLE)"
                f"  WHEN c23 IS NOT NULL THEN"
                f"    CAST({alpha!r} AS DOUBLE) * CAST(c23 AS DOUBLE)"
                f"      / CAST(c2 AS DOUBLE)"
                f"  WHEN c3 IS NOT NULL THEN"
                f"    CAST({alpha!r} AS DOUBLE) * CAST({alpha!r} AS DOUBLE)"
                f"      * CAST(c3 AS DOUBLE) / CAST({n!r} AS DOUBLE)"
                f"  ELSE CAST({alpha!r} AS DOUBLE) * CAST({alpha!r} AS DOUBLE)"
                f"      / CAST({n!r} AS DOUBLE)"
                f" END) * {QUANT}.0) AS BIGINT)"
            ).alias("q"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.expr("(-sum(q)) div count(1)").alias("ce_micro"),
    )


def quantile_cutoffs(
    scored: DataFrame,
    by_col: str,
    value_col: str = "ce_micro",
    k: int = 3,
) -> DataFrame:
    """EXACT k-quantile cutoffs per group WITHOUT a per-row sort — the
    100-TB bucket path: aggregate to (group, value, count) first, then
    window over the DISTINCT values only (bounded by value-space
    granularity, not corpus size), cumulative-sum the counts, and take
    ``cutoff_j = min value whose running count ≥ ceil(j·n/k)`` (the
    standard discrete lower quantile). Integer arithmetic end to end —
    deterministic and SQL-replayable. Returns (by_col, q, cutoff) with
    q ∈ 1..k-1."""
    counts = scored.groupBy(by_col, value_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    w = Window.partitionBy(by_col).orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = scored.groupBy(by_col).agg(F.count(F.lit(1)).alias("__n"))
    cum = counts.withColumn("__cum", F.sum("__c").over(w)).join(
        F.broadcast(tot), by_col
    )
    qs = None
    for j in range(1, k):
        # rank threshold ceil(j*n/k): positive-operand form — both
        # engines' integer division agrees only away from negatives
        thr = F.expr(f"(({j} * __n) + {k - 1}) div {k}")
        cj = (
            cum.where(F.col("__cum") >= thr)
            .groupBy(by_col)
            .agg(F.min(value_col).alias("cutoff"))
            .select(by_col, F.lit(j).alias("q"), "cutoff")
        )
        qs = cj if qs is None else qs.unionByName(cj)
    return qs


def perplexity_buckets_by_cutoff(
    scored: DataFrame,
    by_col: str,
    value_col: str = "ce_micro",
    k: int = 3,
) -> DataFrame:
    """THRESHOLD bucketing under the exact cutoffs — the scalable
    alternative to :func:`perplexity_buckets`: after the bounded
    cutoff computation, bucketing is a broadcast join + one CASE
    projection per row, no per-row window anywhere. Semantics differ
    from ntile ONLY on ties at a boundary (all equal values land in
    the lower bucket together — threshold semantics), which is what a
    production filter wants: a document's bucket depends on its score
    alone, never on its tiebreak position. Adds ``bucket`` ∈ 1..k."""
    cuts = quantile_cutoffs(scored, by_col, value_col, k)
    wide = cuts.groupBy(by_col).pivot("q", list(range(1, k))).agg(
        F.first("cutoff")
    )
    out = scored.join(F.broadcast(wide), by_col)
    bucket = F.lit(k)
    for j in range(k - 1, 0, -1):
        bucket = F.when(F.col(value_col) <= F.col(str(j)), j).otherwise(
            bucket
        )
    return out.withColumn("bucket", bucket).drop(
        *[str(j) for j in range(1, k)]
    )


def train_backoff_lm_by(
    ref: DataFrame, text_col: str, by_col: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """PER-GROUP count models — CCNet fidelity: each language is
    scored under ITS OWN reference model, never a shared one (a German
    doc's fluency is meaningless under an English LM). Same two hash
    aggregations with ``by_col`` added to every key; the backoff
    denominator becomes a |groups|-row relation (by_col, n_total)
    instead of a scalar. Returns (uni, bi, totals)."""
    uni = (
        ref.select(by_col, F.explode(_words(text_col)).alias("w"))
        .groupBy(by_col, "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        ref.select(by_col, F.explode(_bigrams(text_col)).alias("b"))
        .select(by_col, "b.w1", "b.w2")
        .groupBy(by_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    totals = ref.groupBy(by_col).agg(
        F.sum(F.size(_words(text_col))).cast("long").alias("n_total")
    )
    return uni, bi, totals


def score_docs_backoff_by(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    totals: DataFrame,
    id_col: str,
    text_col: str,
    by_col: str,
    alpha: float = 0.4,
) -> DataFrame:
    """Per-group scoring under the per-group models: identical backoff
    chain and micro-nat quantization, with every model join keyed by
    (group, token...) and the denominator broadcast from the
    |groups|-row totals (exact integer→double cast, IEEE quotient —
    engine-portable). Docs whose group has an empty model never match
    a count row and score as all-OOV under that group's N; a group
    absent from ``totals`` entirely drops (no denominator exists).
    Returns (id, by_col, n_bigrams, ce_micro)."""
    big = docs.select(
        id_col, by_col, F.explode(_bigrams(text_col)).alias("b")
    ).select(id_col, by_col, "b.w1", "b.w2")
    scored = (
        big.join(bi, [by_col, "w1", "w2"], "left")
        .join(
            uni.select(
                by_col, F.col("w").alias("w1"), F.col("c").alias("c1")
            ),
            [by_col, "w1"],
            "left",
        )
        .join(
            uni.select(
                by_col, F.col("w").alias("w2"), F.col("c").alias("c2")
            ),
            [by_col, "w2"],
            "left",
        )
        .join(F.broadcast(totals), by_col)
        .select(
            id_col,
            by_col,
            F.expr(
                "CAST(round(ln(CASE"
                "  WHEN c12 IS NOT NULL THEN"
                "    CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)"
                f"  WHEN c2 IS NOT NULL THEN"
                f"    CAST({alpha!r} AS DOUBLE) * CAST(c2 AS DOUBLE)"
                f"      / CAST(n_total AS DOUBLE)"
                f"  ELSE CAST({alpha!r} AS DOUBLE)"
                f"      / CAST(n_total AS DOUBLE)"
                f" END) * {QUANT}.0) AS BIGINT)"
            ).alias("q"),
        )
    )
    return scored.groupBy(id_col, by_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.expr("(-sum(q)) div count(1)").alias("ce_micro"),
    )
