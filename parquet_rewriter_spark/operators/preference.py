"""Preference-pair construction — DPO/RLHF training-data prep.

Preference optimization (DPO, Rafailov et al. 2023; RLHF reward
modeling) trains on (prompt, chosen, rejected) triples. Real
preference data comes from annotators or reward models; the standard
SYNTHETIC construction for pipeline testing and hard-negative mining
is contrastive: the prompt's TRUE continuation is ``chosen`` and
another document's continuation is ``rejected``. This module builds
those triples deterministically:

- :func:`prompt_completion_split` cuts each doc at a fixed word count
  (word-level splitting keeps prompt+completion concatenation EXACT —
  the same property the SFT loss masks rely on).
- :func:`contrastive_preference_pairs` partners every doc with the
  NEXT doc in a deterministic md5 order within its group (cyclic: the
  last wraps to the first), so the rejected completion is a same-group
  but wrong continuation. The order key is ``md5(salt:doc_id)`` — the
  engine's established md5 bridge (operators/packing.py:
  training_order), because a new salt must be an INDEPENDENT
  re-pairing and the knuth-multiplicative portable hash cannot give
  one for ADJACENCY: it is affine in the key, so any additive salt
  only rotates the ring and preserves who neighbors whom (it remains
  the right tool for prefix SELECTION, where rotating the ring does
  move the cut). Singleton groups drop (no partner exists).

Plan shape (100 TB): the split is a pure projection; pairing is ONE
window (lead + first_value over the per-group hash order) — a single
hash exchange on the group key, no self-join, no driver state. The
pair relation is engine-portable end to end and replays in ANSI SQL
(md5 + lead/first_value).

The quality check a production pipeline runs on such pairs — "does
the preference signal actually prefer the true continuation?" — is
the LM cross-entropy comparison in catalog.py's
``dpo_preference_pairs_report``: score prompt+chosen and
prompt+rejected under the language's own backoff LM and count wins.

North-star surface (SURVEY.md §2.2 LLM table); the reference has no
text ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def prompt_completion_split(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k_prompt: int,
) -> DataFrame:
    """(id, prompt, completion): the first ``k_prompt`` words and the
    rest. Docs with ≤ ``k_prompt`` words drop — an empty completion
    can be neither chosen nor rejected. Pure codegen projection."""
    ws = F.split(F.col(text_col), " ")
    return (
        docs.withColumn("__ws", ws)
        .where(F.size("__ws") > k_prompt)
        .select(
            id_col,
            *[c for c in docs.columns if c not in (id_col, text_col)],
            F.array_join(F.slice("__ws", 1, k_prompt), " ").alias(
                "prompt"
            ),
            F.array_join(
                F.expr(f"slice(__ws, {k_prompt + 1}, size(__ws))"), " "
            ).alias("completion"),
        )
    )


def contrastive_preference_pairs(
    split: DataFrame,
    id_col: str,
    group_col: str,
    salt: int = 0,
) -> DataFrame:
    """(id, group, prompt, chosen, rejected): partner every row with
    the next row in deterministic salted-md5 order within its group,
    cyclically — one window, no self-join. ``chosen`` is the row's own
    completion, ``rejected`` the partner's; a new salt is a genuinely
    independent re-pairing (module docstring). Singleton groups drop
    (the only candidate partner is the row itself)."""
    okey = F.md5(
        F.concat_ws(
            ":",
            F.lit(int(salt)).cast("string"),
            F.col(id_col).cast("string"),
        )
    )
    order = [okey.asc(), F.col(id_col).asc()]
    w = Window.partitionBy(group_col).orderBy(*order)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        split.withColumn(
            "rejected",
            F.coalesce(
                F.lead("completion").over(w),
                F.first("completion").over(wf),
            ),
        )
        .withColumn("__n", F.count(F.lit(1)).over(wf))
        .where(F.col("__n") > 1)
        .select(
            id_col,
            group_col,
            "prompt",
            F.col("completion").alias("chosen"),
            "rejected",
        )
    )
