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


def viterbi_segment(
    words: DataFrame,
    pieces: DataFrame,
    word_col: str = "word",
) -> DataFrame:
    """Per-word maximum-likelihood SEGMENTATION (not just its score):
    adds ``pieces`` (array<string>, the optimal piece sequence) and
    ``n_pieces``. Ties on the exact product score are broken by the
    LEXICOGRAPHICALLY SMALLEST space-joined piece string — a total
    order both engines share bit-for-bit (scores are exact IEEE
    products in identical order; the joined strings of two
    segmentations of the same word first differ at a space-vs-char
    position, and ASCII space sorts below every word char in both
    Python and DuckDB's binary collation, so prefix-wise DP lexmin
    equals path-enumeration lexmin — no proper-prefix ambiguity exists
    because de-spacing any candidate yields the same word). The oracle
    (``ug_seg`` in :func:`unigram_cte_sql`) enumerates every path and
    takes max score then min string — an independent algorithm that
    must agree exactly."""
    import math

    rows = pieces.select("piece", "c").collect()
    total = float(sum(int(r["c"]) for r in rows))
    ratio = {r["piece"]: int(r["c"]) / total for r in rows}
    spark = words.sparkSession
    bc = spark.sparkContext.broadcast(
        (ratio, max((len(p) for p in ratio), default=1))
    )

    @F.pandas_udf("array<string>")
    def seg(col: pd.Series) -> pd.Series:
        rmap, lmax = bc.value

        def one(w):
            if not w:
                return None
            n = len(w)
            best = [None] * (n + 1)  # (score, space-joined pieces)
            best[0] = (1.0, "")
            for i in range(1, n + 1):
                for l in range(1, min(lmax, i) + 1):
                    r = rmap.get(w[i - l : i])
                    if r is None or best[i - l] is None:
                        continue
                    s = best[i - l][0] * r
                    prev = best[i - l][1]
                    cand = w[i - l : i] if not prev else prev + " " + w[i - l : i]
                    if (
                        best[i] is None
                        or s > best[i][0]
                        or (s == best[i][0] and cand < best[i][1])
                    ):
                        best[i] = (s, cand)
            if best[n] is None:
                return None
            return best[n][1].split(" ")

        return col.map(one)

    return words.withColumn("pieces", seg(F.col(word_col))).withColumn(
        "n_pieces", F.size("pieces")
    )


def unigram_piece_ids(pieces: DataFrame) -> DataFrame:
    """(piece, piece_id): dense ids in piece order over the bounded
    unigram inventory — the artifact id map, deterministic in any
    engine (single-partition window over ≤ vocab_size + alphabet
    rows)."""
    from pyspark.sql import Window

    w = Window.partitionBy().orderBy("piece")
    return pieces.select(
        "piece", (F.row_number().over(w) - 1).alias("piece_id")
    )


def unigram_encode_docs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    pieces: DataFrame,
    broadcast_threshold: int | None = None,
) -> DataFrame:
    """Encode documents to unigram-LM piece-id sequences — lifecycle
    parity with operators/bpe.py:encode_docs: Viterbi-segment each
    DISTINCT word once (lexmin tie-break, vocab scale), id-map the
    pieces through the broadcast bounded piece-id relation, and
    reassemble per-doc sequences order-safely through the thresholded
    word join (bpe.assemble_doc_ids). Returns (id_col, input_ids,
    n_tokens)."""
    from parquet_rewriter_spark.operators.bpe import (
        BROADCAST_MAX_WORDS,
        assemble_doc_ids,
    )

    if broadcast_threshold is None:
        broadcast_threshold = BROADCAST_MAX_WORDS
    wc = word_counts(df, text_col)
    segd = viterbi_segment(wc, pieces)
    pid = unigram_piece_ids(pieces)
    word_ids = (
        segd.select("word", F.posexplode("pieces").alias("pos", "piece"))
        .join(F.broadcast(pid), "piece")
        .groupBy("word")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "piece_id"))),
                lambda s: s.piece_id,
            ).alias("ids")
        )
    )
    n_words = wc.count()
    return assemble_doc_ids(
        df, id_col, text_col, word_ids, n_words, broadcast_threshold
    )


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
        SELECT word, 0 AS pos, CAST(1.0 AS DOUBLE) AS score,
               CAST('' AS VARCHAR) AS ps
        FROM wc
        UNION ALL
        SELECT p.word, p.pos + len(v.piece) AS pos, p.score * v.r AS score,
               CASE WHEN p.ps = '' THEN v.piece
                    ELSE p.ps || ' ' || v.piece END AS ps
        FROM p JOIN ug_ratio v
          ON substr(p.word, p.pos + 1, len(v.piece)) = v.piece
        WHERE p.pos < len(p.word)
      )
      SELECT word, score, ps FROM p WHERE pos = len(word)
    ),
    ug_best AS (
      SELECT word, ln(max(score)) AS best_ll,
             CAST(count(*) FILTER (WHERE score = m) AS BIGINT) AS n_opt
      FROM (SELECT word, score, max(score) OVER (PARTITION BY word) AS m
            FROM ug_paths)
      GROUP BY word
    ),
    ug_seg AS (
      -- the optimal SEGMENTATION: max exact product score, ties broken
      -- by the lexicographically smallest space-joined piece string
      -- (binary collation == Python's ASCII compare; see
      -- viterbi_segment) — the independent-path-enumeration twin of
      -- Spark's DP lexmin
      SELECT word, string_split(min(ps) FILTER (WHERE score = m), ' ') AS pieces,
             CAST(len(string_split(min(ps) FILTER (WHERE score = m), ' '))
                  AS INT) AS n_pieces
      FROM (SELECT word, score, ps, max(score) OVER (PARTITION BY word) AS m
            FROM ug_paths)
      GROUP BY word
    )"""


__all__ = [
    "piece_stats",
    "viterbi_segment_stats",
    "viterbi_segment",
    "unigram_piece_ids",
    "unigram_encode_docs",
    "unigram_cte_sql",
]
