"""Document chunking — split long texts into fixed-size overlapping
windows, the standard pre-tokenization step of an LLM training
pipeline (context-window packing works on bounded pieces, not
arbitrary-length documents).

Pure built-in expressions: chunk count and offsets are integer
arithmetic, the explode is a generator (no shuffle), the substring is
codegen — so chunking a 100 TB corpus is a single narrow map stage.
Character windows here; token-boundary variants are the same shape
with ``tokens``/``slice`` instead of ``substring``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def n_chunks(text: Column | str, size: int, overlap: int) -> Column:
    """ceil((len - overlap) / step), floored at 1 — integer-portable
    (floor of a positive double) so a SQL oracle reproduces it exactly."""
    if overlap >= size:
        raise ValueError("overlap must be < size")
    step = size - overlap
    length = F.length(text)
    return F.greatest(
        F.lit(1),
        F.floor((length - F.lit(overlap) + F.lit(step - 1)) / F.lit(step)).cast("int"),
    )


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    size: int = 100,
    overlap: int = 20,
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Explode each document into (chunk_idx, chunk) windows of
    ``size`` chars advancing by ``size - overlap``. The final chunk may
    be shorter; every char is covered; consecutive chunks share
    ``overlap`` chars.
    """
    step = size - overlap
    nc = n_chunks(F.col(text_col), size, overlap)
    idx = F.explode(F.sequence(F.lit(0), nc - 1)).alias("chunk_idx")
    out = df.select(*keep_cols, F.col(text_col), idx)
    return out.select(
        *keep_cols,
        "chunk_idx",
        F.expr(f"substring({text_col}, chunk_idx * {step} + 1, {size})").alias("chunk"),
    )
