"""Pre-training corpus filters: Gopher-style quality rules and
C4-style blocklist filtering (Rae et al. 2021 §A1.1; Raffel et al. 2020
§2.2 — public papers; the reference has no text surface, this is
north-star LLM-pipeline surface per SURVEY.md §2.2).

Two distributed shapes, chosen by what each metric needs:

- ``gopher_doc_metrics``: metrics that need per-token frequencies
  (top-token repetition ratio) explode to (doc, token) and re-aggregate
  — ONE hash shuffle on doc_id, skew-free (docs are bounded), and every
  other metric (token count, mean token length, stopword hits) rides
  the same aggregation for free. This is the 100 TB shape: no per-doc
  Python, no quadratic lambda scans over the token array.
- ``badword_flag``: pure projection — ``arrays_overlap`` against a
  broadcast-literal blocklist, zero shuffles, whole-stage codegen.

Both replay exactly in ANSI SQL (unnest + group by / list_intersect),
so the catalog entries are hash-oracled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from parquet_rewriter_spark.functions.text import STOPWORDS, tokens

# Gopher-shaped rule thresholds, adapted to the synthetic fixture corpus
# (single-line word soup, ~5-char vocabulary). Real corpora would widen
# the word-count band and add line-shape rules; the operator shape —
# explode once, aggregate once, flag declaratively — is identical.
GOPHER_MIN_TOKENS = 10
GOPHER_MAX_TOKENS = 100_000
GOPHER_MIN_MEAN_TOK_LEN = 2.0
GOPHER_MAX_MEAN_TOK_LEN = 10.0
GOPHER_MAX_TOP_TOKEN_RATIO = 0.25
GOPHER_MIN_STOPWORD_HITS = 1

BADWORDS: tuple[str, ...] = ("crash", "panic", "corrupt")


def gopher_doc_metrics(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document quality metrics + Gopher rule flags + keep verdict.

    One explode + two hash aggregations (token-level then doc-level),
    both combining map-side; the doc-level agg is the only wide
    exchange. Output columns: n_tokens, mean_tok_len, top_tok_ratio,
    stop_hits, the four rule booleans, and ``keep``.
    """
    per_tok = (
        docs.select(id_col, F.explode(tokens(text_col)).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    doc = per_tok.groupBy(id_col).agg(
        F.sum("c").alias("n_tokens"),
        F.sum(F.col("c") * F.length("tok")).alias("char_sum"),
        F.max("c").alias("top_cnt"),
        F.sum(F.when(F.col("tok").isin(*STOPWORDS), F.col("c")).otherwise(F.lit(0))).alias(
            "stop_hits"
        ),
    )
    mean_len = F.col("char_sum") / F.col("n_tokens")
    top_ratio = F.col("top_cnt") / F.col("n_tokens")
    len_ok = F.col("n_tokens").between(GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS)
    wlen_ok = mean_len.between(GOPHER_MIN_MEAN_TOK_LEN, GOPHER_MAX_MEAN_TOK_LEN)
    rep_ok = top_ratio <= GOPHER_MAX_TOP_TOKEN_RATIO
    stop_ok = F.col("stop_hits") >= GOPHER_MIN_STOPWORD_HITS
    return doc.select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(mean_len, 4).alias("mean_tok_len"),
        F.round(top_ratio, 4).alias("top_tok_ratio"),
        F.col("stop_hits").cast("long").alias("stop_hits"),
        len_ok.alias("len_ok"),
        wlen_ok.alias("wlen_ok"),
        rep_ok.alias("rep_ok"),
        stop_ok.alias("stop_ok"),
        (len_ok & wlen_ok & rep_ok & stop_ok).alias("keep"),
    )


def badword_flag(text_col: Column | str, badwords: tuple[str, ...] = BADWORDS) -> Column:
    """True when the document contains any blocklisted token.

    ``arrays_overlap`` against an array literal — codegen'd, no shuffle,
    no explode; the blocklist travels inside the plan (for lists too big
    to inline, broadcast-join a distinct-token explode instead)."""
    return F.arrays_overlap(tokens(text_col), F.array(*[F.lit(w) for w in badwords]))
