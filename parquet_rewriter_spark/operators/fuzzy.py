"""Fuzzy (edit-distance) string matching with lossless q-gram blocking.

All-pairs ``levenshtein(a, b) <= d`` is O(n²) — unusable beyond toy
scale. The classic blocked plan (Gravano et al., "Approximate String
Joins in a Database (Almost) for Free", VLDB 2001) generates candidate
pairs from shared q-grams and verifies only those:

    count-filter theorem: if edit_distance(a, b) <= d then a and b
    share at least max(|a|,|b|) - q + 1 - q·d q-grams.

So whenever ``max_len - q + 1 - q·d >= 1`` the "shares at least one
q-gram" candidate set provably contains every true match — the blocking
is LOSSLESS and the blocked join returns exactly the all-pairs result
(which is why the DuckDB all-pairs oracle hash-matches it). Strings too
short for the bound (len < q + q·d) are handled in a separate
short-string block that is compared exhaustively; short strings have a
bounded distinct universe (alphabet^len), so that block stays small at
any corpus scale.

Scale shape (100 TB):
- q-gram explode is a projection (no shuffle); the candidate join
  shuffles on the q-gram value — skewed hot grams (e.g. common English
  bigrams) are AQE-split, or pre-filtered by document frequency the
  same way text indexes drop stopwords;
- a length-band predicate (|len(a)-len(b)| <= d) rides along in the
  join condition, pruning candidates before the levenshtein verify;
- verification cost is |candidates|, not n².
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def qgrams(col: Column, q: int) -> Column:
    """Array of the distinct ``q``-grams of ``col`` (positions 1..len-q+1;
    a string shorter than ``q`` yields its whole self as one gram)."""
    n = F.greatest(F.length(col) - q + 1, F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: col.substr(i, F.lit(q)))
    )


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 1,
    q: int = 2,
) -> DataFrame:
    """All (id_a < id_b) pairs with ``levenshtein <= max_dist``, via
    lossless q-gram blocking + exhaustive short-string block. Returns
    (id_a, id_b, name_a, name_b, edit_dist)."""
    short_cut = q + q * max_dist  # below this length, count-filter bound < 1
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("s")).filter(
        F.col("s").isNotNull()
    )
    long_side = base.filter(F.length("s") >= short_cut)
    short_side = base.filter(F.length("s") < short_cut)

    g = long_side.select("id", "s", F.explode(qgrams(F.col("s"), q)).alias("gram"))
    a = g.select(F.col("id").alias("id_a"), F.col("s").alias("s_a"),
                 F.col("gram").alias("gram_a"))
    b = g.select(F.col("id").alias("id_b"), F.col("s").alias("s_b"),
                 F.col("gram").alias("gram_b"))
    long_cand = (
        a.join(
            b,
            (F.col("gram_a") == F.col("gram_b"))
            & (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.length("s_a") - F.length("s_b")) <= max_dist),
        )
        .select("id_a", "id_b", "s_a", "s_b")
        .distinct()
    )
    # short strings: tiny distinct universe → broadcast within the block
    sa = short_side.select(F.col("id").alias("id_a"), F.col("s").alias("s_a"))
    sb = short_side.select(F.col("id").alias("id_b"), F.col("s").alias("s_b"))
    short_cand = sa.join(
        F.broadcast(sb),
        (F.col("id_a") < F.col("id_b"))
        & (F.abs(F.length("s_a") - F.length("s_b")) <= max_dist),
    )
    # cross-block pairs (one short, one long): only long strings within
    # max_dist of the short cutoff can reach a short string — a bounded
    # slice, broadcast-joined against the short block.
    edge = long_side.filter(F.length("s") < short_cut + max_dist)
    cross_cand = (
        edge.select(F.col("id").alias("lid"), F.col("s").alias("ls"))
        .join(
            F.broadcast(
                short_side.select(F.col("id").alias("rid"), F.col("s").alias("rs"))
            ),
            F.abs(F.length("ls") - F.length("rs")) <= max_dist,
        )
        .select(
            F.least("lid", "rid").alias("id_a"),
            F.greatest("lid", "rid").alias("id_b"),
            F.when(F.col("lid") < F.col("rid"), F.col("ls")).otherwise(F.col("rs")).alias("s_a"),
            F.when(F.col("lid") < F.col("rid"), F.col("rs")).otherwise(F.col("ls")).alias("s_b"),
        )
    )
    cand = long_cand.unionByName(short_cand).unionByName(cross_cand).distinct()
    dist = F.levenshtein("s_a", "s_b")
    return cand.filter(dist <= max_dist).select(
        "id_a",
        "id_b",
        F.col("s_a").alias("name_a"),
        F.col("s_b").alias("name_b"),
        dist.alias("edit_dist"),
    )
