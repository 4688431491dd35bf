"""Full-text search over a document corpus: inverted-index construction
and BM25 ranked retrieval (Robertson & Spärck Jones probabilistic
relevance framework; the Okapi BM25 weighting used by Lucene et al.).

Beyond-reference surface (the reference engine stores/merges records;
this is the retrieval layer a training-data pipeline runs on top for
corpus exploration and decontamination lookups).

Scale shape (100 TB corpus):
- the inverted index IS a DataFrame — (term, doc_id, tf) plus a (term,
  df) posting-length side — built with one explode + two hash aggs, no
  driver state; persist it partitioned/bucketed by term and a query
  becomes a semi-join-pruned scan of |query terms| partitions;
- scoring a query touches only the postings of its terms (a broadcast
  semi join on the tiny term list), never the corpus;
- the final ranking is TakeOrderedAndProject top-k (per-partition heap),
  not a global sort.

Tokenization is plain whitespace split, matching functions/text.py and
the ``string_split(text, ' ')`` the DuckDB oracles use, so results are
hash-comparable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from parquet_rewriter_spark.functions.vector import as_double, cosine


def term_postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(term, doc_id, tf) postings via explode + hash agg — the inverted
    index as a relation. Empty tokens (double spaces) are dropped."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k: score = Σ_t idf(t) · tf·(k1+1)/(tf + k1·(1-b+b·len/avg)),
    idf(t) = ln(1 + (N-df+0.5)/(df+0.5)).

    Plan: one explode over the corpus → postings filtered to the query's
    terms (an isin literal — pushed into the aggregation's input), df
    per term from the filtered postings only, doc lengths from a
    separate length agg, N/avglen as a broadcast scalar join. Returns
    (doc_id, score, n_hit_terms) — score rounded to 4dp so the value is
    stable across engines' float-op orderings.
    """
    terms = [t for t in query_terms if t]
    lens = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.filter(F.split(F.col(text_col), " "), lambda x: x != "")).alias("dl"),
    )
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avg_dl")
    )
    post = term_postings(docs, id_col, text_col).filter(F.col("term").isin(terms))
    df_t = post.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (
        F.col("tf") * (1.0 + k1)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avg_dl")))
    )
    return (
        post.join(F.broadcast(df_t), "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(idf * tf_part), 4).alias("score"),
            F.count(F.lit(1)).alias("n_hit_terms"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(k)
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    vectors: DataFrame,
    id_col: str,
    text_col: str,
    vec_id_col: str,
    vec_col: str,
    query_terms: list[str],
    query_vec: list[float],
    k: int = 10,
    n_cand: int = 50,
    k0: int = 60,
) -> DataFrame:
    """Hybrid lexical+vector retrieval fused by Reciprocal Rank Fusion
    (Cormack, Clarke & Buettcher, SIGIR 2009): run BM25 over the text
    and exact cosine over the embedding column independently, keep each
    ranker's top ``n_cand``, and score every candidate as

        rrf(d) = Σ_r 1 / (k0 + rank_r(d))

    over the rankers that retrieved it (a document missing from one
    list simply contributes nothing for that ranker — the standard RRF
    contract, no score normalization needed, which is exactly why RRF
    is the default fusion in production hybrid search: BM25 scores and
    cosines live on incomparable scales).

    Determinism: both per-ranker rankings order by (rounded score desc,
    id), so ranks — and therefore the fused list — are total-order
    stable and SQL-replayable. Scale shape: each ranker is its own
    already-scale-shaped operator (postings semi-join / top-k heap);
    the fusion itself touches only 2·n_cand rows — a full outer join of
    two k-row relations, driver-bounded by construction. The rank
    windows run over those ≤n_cand-row inputs, not the corpus.

    Returns (doc_id, bm25_rank, vec_rank, rrf, rank) — top ``k`` by
    (rrf desc, doc_id)."""
    bm = bm25_topk(docs, id_col, text_col, query_terms, k=n_cand)
    bm_ranked = bm.select(
        F.col("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col("doc_id")))
        .cast("long")
        .alias("bm25_rank"),
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine(as_double(vec_col), q)
    vs = (
        vectors.select(F.col(vec_id_col).alias("doc_id"), F.round(sim, 4).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("doc_id"))
        .limit(n_cand)
    )
    vs_ranked = vs.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("cos_sim").desc(), F.col("doc_id")))
        .cast("long")
        .alias("vec_rank"),
    )
    rrf = F.round(
        F.coalesce(F.lit(1.0) / (F.lit(float(k0)) + F.col("bm25_rank")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(float(k0)) + F.col("vec_rank")), F.lit(0.0)),
        6,
    )
    return (
        bm_ranked.join(vs_ranked, "doc_id", "full_outer")
        .select("doc_id", "bm25_rank", "vec_rank", rrf.alias("rrf"))
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.col("rrf").desc(), F.col("doc_id")))
            .cast("long"),
        )
        .filter(F.col("rank") <= k)
    )


def bm25_sql(
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """ANSI/DuckDB replay of :func:`bm25_topk` for the oracle gate."""
    lits = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms if t)
    return f"""
    WITH toks AS (
      SELECT {id_col} AS doc_id, unnest(string_split({text_col}, ' ')) AS term
      FROM {table}
    ),
    toks_ne AS (SELECT * FROM toks WHERE term <> ''),
    lens AS (SELECT doc_id, count(*) AS dl FROM toks_ne GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avg_dl FROM lens),
    post AS (
      SELECT term, doc_id, count(*) AS tf FROM toks_ne
      WHERE term IN ({lits}) GROUP BY term, doc_id
    ),
    dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM post GROUP BY term)
    SELECT p.doc_id,
           round(sum(
             ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * p.tf * (1.0 + {k1})
             / (p.tf + {k1} * (1.0 - {b} + {b} * l.dl / s.avg_dl))
           ), 4) AS score,
           count(*) AS n_hit_terms
    FROM post p JOIN dfs d USING (term) JOIN lens l USING (doc_id), stats s
    GROUP BY p.doc_id
    ORDER BY score DESC, p.doc_id
    LIMIT {k}
    """
