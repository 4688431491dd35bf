"""Python UDTFs (table functions) — the 1→N row-expansion member of the
UDF family (SURVEY.md §2.2 UDF/UDAF/UDTF row; scalar pandas UDFs live in
operators/similarity.py, grouped-agg in functions/udafs.py,
applyInPandas/mapInPandas in streaming/ and sources/multimodal.py).

A UDTF runs Python per input row and yields output rows — the slow path
by design (SURVEY's "UDFs are the slow path"): use it only for logic a
lateral explode of built-ins can't express. The sentence splitter here
is deliberately simple so the oracle can replay it in SQL; its value in
the catalog is pinning the UDTF plumbing (registration, LATERAL join,
schema contract), not the splitting itself.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="sent_idx int, sentence string, sent_chars int")
class SplitSentences:
    """text → one row per non-empty '.'-separated sentence, with its
    position and trimmed length. Deterministic, no state."""

    def eval(self, text: str):  # noqa: D102 - contract in class docstring
        if text is None:
            return
        for i, part in enumerate(text.split(".")):
            s = part.strip()
            if s:
                yield i, s, len(s)


def register_udtfs(spark) -> None:
    """Register all module UDTFs for SQL use (idempotent)."""
    spark.udtf.register("split_sentences", SplitSentences)
