"""Text-analysis column functions for the LLM-data-pipeline surface:
tokenization, quality scoring, stopword/language heuristics,
fingerprinting (SURVEY.md §2.2 LLM-pipeline table).

All pure ``pyspark.sql.functions`` expressions (JVM-side, whole-stage
codegen) — no Python in the hot path. Each has an exact ANSI-SQL
equivalent so the DuckDB oracle can replay it (catalog.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F

# Per-language marker-word sets for the n-gram/stopword language-ID
# heuristic. The fixture corpus is synthetic (shared vocabulary), so
# these are demo marker sets over that vocabulary; for real corpora,
# swap in real stopword lists — the operator shape is identical.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("data", "batch", "stream", "group"),
    "en": ("the", "a", "fast", "slow"),
    "es": ("row", "column", "table", "value"),
    "fr": ("join", "merge", "sort", "filter"),
    "zh": ("spark", "query", "window", "vector"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to", "in")


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (fixture corpus is single-spaced)."""
    return F.split(text, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def _count_in(tok: Column, words: tuple[str, ...]) -> Column:
    """Count of tokens that are members of ``words`` (with repeats)."""
    return F.size(F.filter(tok, lambda t: t.isin(*words)))


def stopword_ratio(text: Column | str) -> Column:
    tok = tokens(text)
    return _count_in(tok, STOPWORDS) / F.size(tok)


def unique_token_ratio(text: Column | str) -> Column:
    tok = tokens(text)
    return F.size(F.array_distinct(tok)) / F.size(tok)


def avg_token_length(text: Column | str) -> Column:
    tok = tokens(text)
    return (F.length(text) - F.size(tok) + 1) / F.size(tok)


def quality_score(text: Column | str) -> Column:
    """Heuristic document-quality score in [0, 1]: rewards lexical
    diversity and moderate length, penalizes stopword stuffing —
    the standard pre-training filter shape (length/stopword/diversity)."""
    t = F.col(text) if isinstance(text, str) else text
    diversity = unique_token_ratio(t)
    stop_pen = 1.0 - stopword_ratio(t)
    len_norm = F.least(F.length(t) / F.lit(500.0), F.lit(1.0))
    return F.round(0.5 * diversity + 0.3 * stop_pen + 0.2 * len_norm, 4)


def compression_ratio(text: Column | str, level: int = 6) -> Column:
    """zlib-compressed-size / raw-size per document — the classic
    cheap boilerplate detector (highly repetitive pages compress far
    below natural text; Gopher and successors gate on it). Arrow-batched
    pandas UDF: zlib is inherently per-string, but batches amortize the
    exchange; output is deterministic for a fixed zlib level. No SQL
    oracle exists for zlib — catalog entries using this are rows-only
    and the monotonicity contract is property-tested."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(texts: pd.Series) -> pd.Series:
        import zlib

        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return 1.0
            return round(len(zlib.compress(raw, level)) / len(raw), 6)

        return texts.map(one)

    return _ratio(F.col(text) if isinstance(text, str) else text)


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Marker-hit count per language (the lang-ID feature vector)."""
    tok = tokens(text)
    return {lang: _count_in(tok, words) for lang, words in sorted(LANG_MARKERS.items())}


def lang_id(text: Column | str) -> Column:
    """Predicted language = argmax marker score, ties broken by
    alphabetical language order (first CASE branch wins)."""
    scores = lang_scores(text)
    langs = sorted(scores)
    pred = None
    for lang in langs:
        cond = F.lit(True)
        for other in langs:
            if other != lang:
                cond = cond & (scores[lang] >= scores[other])
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return pred


def fingerprint_md5(text: Column | str) -> Column:
    """Content fingerprint: md5 hex (portable across engines)."""
    return F.md5(F.col(text) if isinstance(text, str) else text)


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram set — the unit set for Jaccard/MinHash.
    Sliding window over the token array via transform + slice;
    documents shorter than n tokens yield their whole token string."""
    tok = tokens(text)
    k = F.size(tok) - (n - 1)
    return F.when(
        k <= 0, F.array(F.concat_ws(" ", tok))
    ).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), k - 1),
                lambda i: F.concat_ws(" ", F.slice(tok, i + 1, n)),
            )
        )
    )


def tfidf_top_terms(
    df,
    id_col: str,
    text_col: str,
    k: int = 3,
    ndigits: int = 4,
):
    """Top-``k`` TF-IDF terms per document: (doc_id, term, tfidf, rk).

    Shape (three stages, each a single shuffle or less):
    1. explode tokens → groupBy(doc, term) count — the only
       corpus-sized shuffle, with map-side partial aggregation;
    2. document frequency = groupBy(term) over the (doc, term) pairs —
       vocabulary-sized output, explicitly broadcast back (vocabulary ≪
       corpus; if the vocab outgrows the broadcast threshold drop the
       hint and it degrades to a shuffle join, nothing breaks);
    3. per-doc top-k via row_number over (tfidf DESC, term) — ranking
       on the ROUNDED score keeps the ordering reproducible across
       engines (the DuckDB oracle replays it bit-for-bit).

    idf = ln(N / df_t) — the classic form; N is broadcast as a 1-row
    relation, never a driver round-trip.
    """
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(broadcast(dfreq), "term")
        .crossJoin(broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("dfreq")),
                ndigits,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", "tfidf", "rk")
    )
