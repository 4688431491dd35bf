"""Byte-Pair Encoding tokenizer training and application (Sennrich,
Haddow & Birch, ACL 2016) as distributed relational algebra.

Reference scope note: the reference engine has no text operators — this
module is part of the beyond-reference training-data surface.

The classical algorithm, kept classical: one corpus pass aggregates the
word-frequency relation (vocab ≪ corpus — THE key size reduction; BPE
has always trained on the word dictionary, not the raw text), each word
initialized as a space-joined character-symbol string ending in the
``</w>`` marker. Each merge round is then a VOCAB-scale job, not a
corpus-scale one:

    pair counts   explode adjacent symbol pairs weighted by word count
                  (map-side combined; output ≤ distinct-pair rows)
    top pair      1 collected row (count DESC, lhs, rhs — total order,
                  so training is deterministic and SQL-replayable)
    apply merge   a literal string replace ``' l r ' → ' lr '`` over the
                  padded symbol strings (both Spark's ``replace`` and
                  ANSI ``replace`` scan left-to-right non-overlapping —
                  identical greedy semantics, pinned in tests)

The word relation is persisted once: training cost = 1 corpus scan +
``n_merges`` vocab-scale rounds, each a tiny shuffle. At 100 TB the
corpus scan dominates and happens exactly once.

ENCODING reuses the same insight: encode each DISTINCT word once (the
vocab relation already carries the merged symbol strings), then
broadcast-join documents' exploded words against the ≤vocab-row
(word → n_tokens) relation — the corpus is never character-exploded.

Everything — char splitting (regexp ``(.) → $1␣``), pair extraction,
tie-breaks, the replace mechanics — has an exact DuckDB replay emitted
by :func:`bpe_vocab_cte_sql`, so merge rules AND downstream fertility
stats are hash-compared, not spot-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

END = "</w>"


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt) over lowercased whitespace tokens — the one
    corpus-scale pass of BPE training."""
    w = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    return (
        df.select(F.explode(w).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _init_sym() -> Column:
    """Padded initial symbol string of ``word``:
    ``' h e l l o </w> '`` — every symbol has a space on both sides so
    a merge is ONE literal replace."""
    return F.concat(F.lit(" "), F.regexp_replace(F.col("word"), "(.)", "$1 "),
                    F.lit(END), F.lit(" "))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(lhs, rhs, c): adjacent-symbol pair counts weighted by word
    count. Codegen split/slice/zip/explode; map-side combined."""
    arr = F.split(F.trim(F.col("sym")), " ")
    n = F.size(arr)
    pairs = F.zip_with(
        F.slice(arr, 1, n - 1),
        F.slice(arr, 2, n - 1),
        lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
    )
    return (
        vocab.where(n >= 2)
        .select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("cnt").alias("c"))
    )


def bpe_train(
    df: DataFrame, text_col: str, n_merges: int = 6
) -> tuple[list[dict], DataFrame]:
    """Learn ``n_merges`` merge rules. Returns (rules, vocab): rules as
    [{step, lhs, rhs, merged, pair_count}, ...] in learned order, vocab
    as the final (word, cnt, sym) relation with all merges applied
    (reuse it for encoding — don't retrain)."""
    base = word_counts(df, text_col).select(
        "word", "cnt", _init_sym().alias("sym")
    ).persist()
    base.count()  # materialize: n_merges rounds reuse it
    vocab = base
    rules: list[dict] = []
    for step in range(1, n_merges + 1):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("c").desc(), F.col("lhs"), F.col("rhs"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, c = top[0]["lhs"], top[0]["rhs"], int(top[0]["c"])
        rules.append(
            {"step": step, "lhs": l, "rhs": r, "merged": l + r, "pair_count": c}
        )
        vocab = vocab.withColumn(
            "sym", F.replace(F.col("sym"), F.lit(f" {l} {r} "), F.lit(f" {l}{r} "))
        )
    if vocab is not base:
        # hand the caller a SELF-persisted relation so vocab.unpersist()
        # actually frees the cache (persisting the derivative reads the
        # still-cached base once, then the base can go)
        vocab = vocab.persist()
        vocab.count()
        base.unpersist()
    return rules, vocab


def rules_df(spark: SparkSession, rules: list[dict]) -> DataFrame:
    from pyspark.sql.types import (
        LongType, IntegerType, StringType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("step", IntegerType()),
            StructField("lhs", StringType()),
            StructField("rhs", StringType()),
            StructField("merged", StringType()),
            StructField("pair_count", LongType()),
        ]
    )
    return spark.createDataFrame(
        [(r["step"], r["lhs"], r["rhs"], r["merged"], r["pair_count"]) for r in rules],
        schema,
    )


def vocab_token_counts(vocab: DataFrame) -> DataFrame:
    """(word, n_tokens) under the trained merges — each distinct word
    encoded ONCE; broadcast this against the corpus."""
    return vocab.select(
        "word", F.size(F.split(F.trim(F.col("sym")), " ")).alias("n_tokens")
    )


def fertility_by(
    df: DataFrame, text_col: str, group_col: str, vocab: DataFrame
) -> DataFrame:
    """Tokenizer fertility (tokens per word) per group: explode the
    corpus into word occurrences, broadcast-join the ≤vocab-row token
    counts, aggregate. (group, n_words, n_tokens, fertility)."""
    w = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    occ = df.select(F.col(group_col).alias("grp"), F.explode(w).alias("word"))
    vt = vocab_token_counts(vocab)
    return (
        occ.join(F.broadcast(vt), "word")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_words",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("n_words"), 4).alias("fertility"),
        )
    )


# --------------------------------------------------------------- SQL replay


def bpe_vocab_cte_sql(table: str, text_col: str, n_merges: int) -> str:
    """DuckDB CTE chain replaying training exactly: emits CTEs
    ``v0..v{n}`` (word, cnt, sym) and ``t1..t{n}`` (step, lhs, rhs, c).
    Compose with a final SELECT over the ``t``s (merge rules) or
    ``v{n}`` (encoded vocab)."""
    parts = [
        f"""v0 AS (
          SELECT word, count(*) AS cnt,
                 ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') || '{END} ' AS sym
          FROM (
            SELECT unnest(list_filter(
                     regexp_split_to_array(lower({text_col}), '\\s+'),
                     w -> w <> '')) AS word
            FROM {table}
          ) GROUP BY word
        )"""
    ]
    for s in range(1, n_merges + 1):
        prev = f"v{s - 1}"
        parts.append(
            f"""p{s} AS (
              SELECT ws[i] AS lhs, ws[i + 1] AS rhs, CAST(sum(cnt) AS BIGINT) AS c
              FROM (SELECT string_split(trim(sym), ' ') AS ws, cnt FROM {prev}),
                   LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i)
              GROUP BY 1, 2
            )""")
        parts.append(
            f"""t{s} AS (
              SELECT {s} AS step, lhs, rhs, c FROM p{s}
              ORDER BY c DESC, lhs, rhs LIMIT 1
            )""")
        parts.append(
            f"""v{s} AS (
              SELECT word, cnt,
                     replace(sym, ' ' || t.lhs || ' ' || t.rhs || ' ',
                                  ' ' || t.lhs || t.rhs || ' ') AS sym
              FROM {prev}, t{s} t
            )""")
    return ",\n".join(parts)


__all__ = [
    "END",
    "word_counts",
    "bpe_train",
    "rules_df",
    "vocab_token_counts",
    "fertility_by",
    "symbol_vocab",
    "encode_docs",
    "bpe_vocab_cte_sql",
]


def symbol_vocab(vocab: DataFrame) -> DataFrame:
    """The tokenizer ARTIFACT: (symbol, token_id, freq) over the final
    merged symbols — ids are dense ranks in symbol order (deterministic
    in any engine), freq is the corpus-weighted occurrence count. The
    relation is bounded (≤ alphabet + n_merges + |END| symbols), so the
    single-partition ranking window is a non-issue at any scale."""
    from pyspark.sql import Window

    syms = vocab.select(
        F.explode(F.split(F.trim(F.col("sym")), " ")).alias("symbol"),
        F.col("cnt"),
    )
    agg = syms.groupBy("symbol").agg(F.sum("cnt").alias("freq"))
    w = Window.partitionBy().orderBy("symbol")
    return agg.select(
        "symbol", (F.row_number().over(w) - 1).alias("token_id"), "freq"
    )


def encode_docs(
    df: DataFrame, id_col: str, text_col: str, vocab: DataFrame
) -> DataFrame:
    """Encode documents to BPE token-id sequences: (id, input_ids,
    n_tokens). Same discipline as fertility_by — each DISTINCT word is
    id-mapped ONCE in the vocab relation (vocab-scale), then documents'
    word occurrences broadcast-join the (word → ids) projection and the
    per-doc sequence reassembles order-safely via array_sort over
    (position, ids) structs (never a bare collect_list, whose order is
    partition-dependent)."""
    sid = symbol_vocab(vocab)
    word_syms = vocab.select(
        "word",
        F.posexplode(F.split(F.trim(F.col("sym")), " ")).alias("pos", "symbol"),
    )
    word_ids = (
        word_syms.join(F.broadcast(sid.select("symbol", "token_id")), "symbol")
        .groupBy("word")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token_id"))),
                lambda s: s.token_id,
            ).alias("ids")
        )
    )
    wlist = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    words = df.select(
        F.col(id_col).alias("id"), F.posexplode(wlist).alias("wpos", "word")
    )
    return (
        words.join(F.broadcast(word_ids), "word")
        .groupBy("id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("wpos", "ids"))),
                    lambda s: s.ids,
                )
            ).alias("input_ids")
        )
        .select(
            F.col("id").alias(id_col),
            "input_ids",
            F.size("input_ids").alias("n_tokens"),
        )
    )
