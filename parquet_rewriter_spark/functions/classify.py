"""Naive-Bayes text classifier, expressed relationally.

"Train a classifier" is usually a detour into an ML library; for
bag-of-words naive Bayes the whole thing — training AND inference — is
relational algebra, which means it runs JVM-side at corpus scale and a
SQL oracle can replay it bit-for-bit:

    P(lang | doc) ∝ P(lang) · Π P(w | lang)
    P(w | lang)  = (c(w, lang) + 1) / (N_lang + V)     (add-one)

Plan shape (and the 100 TB story):

- TRAIN: one explode → one hash aggregation keyed (w, lang); priors =
  one tiny aggregate. The per-language vocabulary grid (distinct token
  × language) densifies via a broadcast of the |langs|-row dim — the
  left join zero-fills unseen (w, lang) pairs so smoothing needs no
  join-miss special case.
- PREDICT: doc tokens shuffle-join the model on the token (the model
  may exceed broadcast size at web scale — token-keyed shuffle is the
  shape that survives), fan-out |langs| rows per token occurrence
  (constant factor), one hash agg per (doc, lang), then a per-doc
  window for the argmax. Scores are ROUNDED before ranking so the
  argmax is reproducible across engines (ties then break on language
  code — deterministic, and a genuine tie at 1e-6 log-prob means the
  classes are indistinguishable anyway).

This is the trained complement of the heuristic n-gram language ID in
functions/text.py; `confusion_matrix` grades it against the fixture's
labels. North-star surface (SURVEY.md §2.2 LLM table); the reference
has no text ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TOKEN_SEP = " "


def _tokens(docs: DataFrame, id_col: str, text_col: str, label_col: str | None) -> DataFrame:
    cols = [id_col] + ([label_col] if label_col else [])
    return docs.select(
        *cols, F.explode(F.split(F.col(text_col), TOKEN_SEP)).alias("w")
    )


def train_nb(docs: DataFrame, text_col: str, label_col: str):
    """Returns (likelihoods, priors): likelihoods has one row per
    (w, label) over the DENSE token×label grid with smoothed
    ``log_pwl``; priors has (label, log_prior)."""
    toks = _tokens(docs.select(text_col, label_col, F.lit(0).alias("_i")), "_i", text_col, label_col)
    counts = toks.groupBy("w", label_col).agg(F.count(F.lit(1)).alias("c"))
    n_lang = counts.groupBy(label_col).agg(F.sum("c").alias("n_l"))
    vocab = counts.select("w").distinct()
    v = vocab.count()  # scalar: vocabulary size for the smoothing mass
    labels = n_lang.select(label_col, "n_l")
    grid = vocab.crossJoin(F.broadcast(labels))
    lik = (
        grid.join(counts, ["w", label_col], "left")
        .select(
            "w", label_col,
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0))
                / (F.col("n_l").cast("double") + F.lit(float(v)))
            ).alias("log_pwl"),
        )
    )
    n_docs = docs.count()
    priors = (
        docs.groupBy(label_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(label_col, F.log(F.col("n") / F.lit(float(n_docs))).alias("log_prior"))
    )
    return lik, priors


def predict_nb(
    docs: DataFrame,
    lik: DataFrame,
    priors: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """(id, predicted label, rounded score). Unseen tokens (absent from
    the training vocabulary) contribute nothing — the standard
    ignore-OOV convention, replayed identically by the oracle."""
    toks = _tokens(docs, id_col, text_col, None)
    scored = (
        toks.join(lik, "w")  # token-keyed shuffle join: model can be huge
        .groupBy(id_col, label_col)
        .agg(F.sum("log_pwl").alias("ll"))
        .join(F.broadcast(priors), label_col)
        .select(
            id_col, label_col,
            F.round(F.col("ll") + F.col("log_prior"), round_digits).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col(label_col))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(id_col, F.col(label_col).alias("pred"), "score")
    )


def confusion_matrix(
    docs: DataFrame, id_col: str, text_col: str, label_col: str
) -> DataFrame:
    """Self-train/self-score confusion matrix (label, pred, n_docs) —
    the resubstitution accuracy report for the corpus labeler."""
    lik, priors = train_nb(docs, text_col, label_col)
    pred = predict_nb(docs, lik, priors, id_col, text_col, label_col)
    return (
        docs.select(id_col, label_col)
        .join(pred, id_col)
        .groupBy(label_col, "pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
