"""Corpus bigram language model: train + per-document scoring.

CCNet/C4-style quality filtering scores each document under a language
model and drops the tails (gibberish scores low; boilerplate scores
suspiciously high). A full neural LM doesn't belong in the engine; the
classic scalable stand-in is an n-gram model with add-one smoothing,
trained on the corpus itself — pure relational algebra, so it runs
JVM-side end to end and the DuckDB oracle can replay it bit-for-bit.

    P(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)
    score(doc) = mean over the doc's bigrams of ln P(w2 | w1)

Plan shape (and why it scales):

- bigram explode is a narrow map stage (``transform`` over the token
  array — no shuffle, no UDF);
- model training is ONE hash aggregation over the exploded bigrams
  (map-side partial aggregation absorbs the heavy head — stopword
  bigrams combine before the shuffle);
- scoring joins the doc bigrams back to the model on (w1, w2) and to
  the context totals on w1 — shuffle joins keyed by the n-gram, the
  only shape that works when the model itself is too big to broadcast
  (vocab² potential); Spark broadcasts automatically if it is small;
- the vocabulary size V is a 1-row aggregate, joined by broadcast.

Because the model is trained on the same corpus being scored, every
document bigram exists in the model — the join is total, no smoothing
path depends on join misses.

North-star surface (SURVEY.md §2.2 LLM table: text analysis/quality);
the reference has no text ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_SEP = " "


def _doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair; narrow stage."""
    toks = F.split(F.col(text_col), TOKEN_SEP)
    pairs = F.when(
        F.size(toks) >= 2,
        F.expr(
            f"transform(sequence(1, size(split({text_col}, '{TOKEN_SEP}')) - 1), "
            f"i -> struct(element_at(split({text_col}, '{TOKEN_SEP}'), i) AS w1, "
            f"element_at(split({text_col}, '{TOKEN_SEP}'), i + 1) AS w2))"
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return (
        docs.select(F.col(id_col), F.explode(pairs).alias("p"))
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def train_bigram_lm(docs: DataFrame, text_col: str = "text"):
    """Returns (bigram_counts, context_counts, vocab_size_df).

    bigram_counts: (w1, w2, n12); context_counts: (w1, n1) where n1 is
    the number of bigrams starting at w1 (so probabilities normalize
    over observed continuations + smoothing mass); vocab_size_df: 1 row
    (v) counting distinct tokens anywhere in the corpus.
    """
    toks = F.explode(F.split(F.col(text_col), TOKEN_SEP)).alias("w")
    grams = _doc_bigrams(docs.select(F.lit(0).alias("_id"), text_col), "_id", text_col)
    n12 = grams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    n1 = n12.groupBy("w1").agg(F.sum("n12").alias("n1"))
    vocab = docs.select(toks).agg(F.count_distinct("w").alias("v"))
    return n12, n1, vocab


def score_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """(id, n_bigrams, avg_logp): mean ln-probability of each doc's
    bigrams under the corpus model; 0.0 for docs with < 2 tokens."""
    n12, n1, vocab = train_bigram_lm(docs, text_col)
    grams = _doc_bigrams(docs, id_col, text_col)
    scored = (
        grams.join(n12, ["w1", "w2"])
        .join(n1, "w1")
        .join(F.broadcast(vocab))
        .select(
            id_col,
            F.log(
                (F.col("n12") + F.lit(1.0))
                / (F.col("n1").cast("double") + F.col("v"))
            ).alias("lp"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("lp"), round_digits).alias("avg_logp"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("avg_logp", F.lit(0.0)).alias("avg_logp"),
        )
    )
