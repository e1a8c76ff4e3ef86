"""Preference-pair construction for DPO/RLHF-style post-training sets.

Given candidate responses grouped per prompt (or near-dup cluster,
or any grouping), emit one (chosen, rejected) pair per group: the
highest- and lowest-scored members, with the score margin — the
standard reduction from "k ranked candidates" to the pairwise format
DPO/RM training consumes.

Scale shape: ONE groupBy shuffle. Chosen/rejected are argmax/argmin
via struct-ordered MAX/MIN aggregates (no window, no second shuffle,
no per-group sort): max(struct(score, -id, id)) picks the highest
score with ties broken toward the LOWEST id, min(struct(score, id))
the lowest score with the same tie rule — deterministic across
engines and partitionings. Rows with a NULL score are dropped up
front (they can neither win nor lose a comparison).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def preference_pairs(candidates: DataFrame, group_col: str,
                     score: Column, id_col: str = "doc_id",
                     min_margin: float = 0.0) -> DataFrame:
    """(group, chosen_id, rejected_id, chosen_score, rejected_score,
    margin) — one row per group with >=2 scored members and
    margin >= min_margin. `score` is any Column (plug in a model
    score, a quality heuristic, a reward)."""
    scored = (
        candidates.select(
            F.col(group_col), F.col(id_col).alias("__id"),
            score.cast("double").alias("__s"))
        .where(F.col("__s").isNotNull())
    )
    agg = scored.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("__n"),
        F.max(F.struct(
            F.col("__s"), (-F.col("__id")).alias("__neg"),
            F.col("__id"))).alias("__hi"),
        F.min(F.struct(F.col("__s"), F.col("__id"))).alias("__lo"),
    )
    return (
        agg.where(F.col("__n") >= 2)
        .select(
            F.col(group_col),
            F.col("__hi.__id").alias("chosen_id"),
            F.col("__lo.__id").alias("rejected_id"),
            F.col("__hi.__s").alias("chosen_score"),
            F.col("__lo.__s").alias("rejected_score"),
            (F.col("__hi.__s") - F.col("__lo.__s")).alias("margin"),
        )
        .where(F.col("margin") >= F.lit(min_margin))
        # a group whose best and worst are the SAME row (all-tied
        # scores collapse both argmax and argmin onto the lowest id)
        # is not a pair
        .where(F.col("chosen_id") != F.col("rejected_id"))
    )
