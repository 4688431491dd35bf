"""Unigram-LM (maximum-likelihood) subword segmentation — the third
tokenizer family (Kudo, ACL 2018: SentencePiece's unigram model) next
to BPE (operators/bpe.py) and WordPiece (operators/wordpiece.py),
sharing their discipline: segmentation runs once per DISTINCT WORD
(vocab ≪ corpus), the piece inventory is bounded and broadcast, and
every result has an exact DuckDB replay.

Reference scope note: the reference engine has no text operators —
this module is part of the beyond-reference training-data surface.

Model: each inventory piece carries probability c(piece)/T (corpus-
weighted substring occurrence counts over the distinct-word relation;
T = inventory total), and a word's segmentation likelihood is the
product of its pieces' probabilities. Spark finds the optimum with a
Viterbi DP per distinct word (Arrow-batched pandas UDF at vocab
scale); the oracle ENUMERATES every segmentation path with a
recursive CTE and takes the max — two independent algorithms, one
function.

CROSS-ENGINE DETERMINISM is engineered, not hoped for: scores are
products of ``c/T`` doubles — IEEE division and multiplication are
exactly specified, and both engines multiply in the same left-to-
right path order, so optimal scores AND the count of optimal paths
match bit-for-bit. ``ln`` (libm, not correctly rounded) only touches
the final DISPLAY value, after the argmax, where a 1-ulp wobble is
absorbed by rounding. No tie-break rule is needed: ties are reported,
not broken (``n_opt`` = number of maximum-likelihood segmentations).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from parquet_rewriter_spark.operators.bpe import word_counts


def piece_stats(
    df: DataFrame,
    text_col: str,
    max_piece_len: int = 4,
    vocab_size: int = 150,
) -> DataFrame:
    """(piece, c) — the unigram inventory with corpus-weighted
    substring occurrence counts: top ``vocab_size`` multi-char pieces
    (count DESC, piece ASC — total order) plus every corpus char with
    its own count (guaranteed coverage). One vocab-scale job over the
    distinct-word relation."""
    wc = word_counts(df, text_col)
    lens = F.filter(
        F.sequence(F.lit(1), F.lit(max_piece_len)),
        lambda l: F.length("word") >= l,
    )
    subs = F.flatten(
        F.transform(
            lens,
            lambda l: F.transform(
                F.sequence(F.lit(1), F.length("word") - l + 1),
                lambda i: F.col("word").substr(i, l),
            ),
        )
    )
    counts = (
        wc.select(F.explode(subs).alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("c"))
    )
    topk = (
        counts.where(F.length("piece") >= 2)
        .orderBy(F.col("c").desc(), "piece")
        .limit(vocab_size)
    )
    chars = counts.where(F.length("piece") == 1)
    return topk.unionByName(chars)


def viterbi_segment_stats(
    words: DataFrame,
    pieces: DataFrame,
    word_col: str = "word",
) -> DataFrame:
    """Per-word maximum-likelihood segmentation statistics under the
    unigram model: adds ``best_ll`` (natural log of the optimal
    product-of-probabilities) and ``n_opt`` (how many segmentations
    achieve it — ties reported, never broken). Viterbi DP per row of
    the (distinct-word-scale) input; the bounded (piece → c/T) table
    is broadcast once. DP scores multiply left-to-right exactly like
    the oracle's path enumeration, so optima and tie counts agree
    bit-for-bit across engines."""
    import math

    rows = pieces.select("piece", "c").collect()
    total = float(sum(int(r["c"]) for r in rows))
    ratio = {r["piece"]: int(r["c"]) / total for r in rows}
    spark = words.sparkSession
    bc = spark.sparkContext.broadcast(
        (ratio, max((len(p) for p in ratio), default=1))
    )

    @F.pandas_udf("struct<best_ll: double, n_opt: long>")
    def vit(col: pd.Series) -> pd.DataFrame:
        rmap, lmax = bc.value

        def one(w):
            if not w:
                return (None, 0)
            n = len(w)
            best = [None] * (n + 1)
            cnt = [0] * (n + 1)
            best[0], cnt[0] = 1.0, 1
            for i in range(1, n + 1):
                for l in range(1, min(lmax, i) + 1):
                    r = rmap.get(w[i - l : i])
                    if r is None or best[i - l] is None:
                        continue
                    s = best[i - l] * r
                    if best[i] is None or s > best[i]:
                        best[i], cnt[i] = s, cnt[i - l]
                    elif s == best[i]:
                        cnt[i] += cnt[i - l]
            if best[n] is None:
                return (None, 0)
            return (math.log(best[n]), cnt[n])

        res = [one(w) for w in col]
        return pd.DataFrame(
            {"best_ll": [r[0] for r in res], "n_opt": [r[1] for r in res]}
        )

    out = words.withColumn("__v", vit(F.col(word_col)))
    return out.select(
        "*", F.col("__v.best_ll").alias("best_ll"), F.col("__v.n_opt").alias("n_opt")
    ).drop("__v")


# --------------------------------------------------------------- SQL replay


def unigram_cte_sql(
    table: str, text_col: str, max_piece_len: int = 4, vocab_size: int = 150
) -> str:
    """DuckDB CTE chain: ``wc`` (word, cnt), ``ug_stats`` (piece, c),
    ``ug_ratio`` (piece, r = c/T) and ``ug_best`` (word, best_ll,
    n_opt). ``ug_best`` comes from ENUMERATING every segmentation with
    a recursive CTE (running product in left-to-right path order) —
    an independent algorithm from Spark's DP; optimal scores and tie
    counts must still match bit-for-bit because both engines multiply
    the same exact c/T doubles in the same order. Path count per word
    is bounded by the composition count over piece lengths 1..4 of a
    ≤~20-char word — fine for an oracle, never the production path."""
    return f"""wc AS (
      SELECT word, count(*) AS cnt
      FROM (
        SELECT unnest(list_filter(
                 regexp_split_to_array(lower({text_col}), '\\s+'),
                 w -> w <> '')) AS word
        FROM {table}
      ) GROUP BY word
    ),
    ug_counts AS (
      SELECT substr(word, i, l) AS piece, CAST(sum(cnt) AS BIGINT) AS c
      FROM wc,
           LATERAL (SELECT unnest(generate_series(
                      1, least(len(word), {max_piece_len}))) AS l),
           LATERAL (SELECT unnest(generate_series(1, len(word) - l + 1)) AS i)
      GROUP BY 1
    ),
    ug_stats AS (
      SELECT piece, c FROM (
        SELECT piece, c FROM ug_counts WHERE len(piece) >= 2
        ORDER BY c DESC, piece LIMIT {vocab_size}
      )
      UNION ALL
      SELECT piece, c FROM ug_counts WHERE len(piece) = 1
    ),
    ug_ratio AS (
      SELECT piece, c / (SELECT CAST(sum(c) AS DOUBLE) FROM ug_stats) AS r
      FROM ug_stats
    ),
    ug_paths AS (
      WITH RECURSIVE p AS (
        SELECT word, 0 AS pos, CAST(1.0 AS DOUBLE) AS score FROM wc
        UNION ALL
        SELECT p.word, p.pos + len(v.piece) AS pos, p.score * v.r AS score
        FROM p JOIN ug_ratio v
          ON substr(p.word, p.pos + 1, len(v.piece)) = v.piece
        WHERE p.pos < len(p.word)
      )
      SELECT word, score FROM p WHERE pos = len(word)
    ),
    ug_best AS (
      SELECT word, ln(max(score)) AS best_ll,
             CAST(count(*) FILTER (WHERE score = m) AS BIGINT) AS n_opt
      FROM (SELECT word, score, max(score) OVER (PARTITION BY word) AS m
            FROM ug_paths)
      GROUP BY word
    )"""


__all__ = ["piece_stats", "viterbi_segment_stats", "unigram_cte_sql"]
