"""Record linkage / fuzzy entity resolution.

The master-data-management primitive a warehouse pipeline needs when
the same real-world entity arrives under near-identical names
("Acme Corp" / "Acme Corp."). The scalable shape is the dedup-tier
shape used throughout this package:

1. **Collapse to distinct names first.** The quadratic must run over
   distinct (name) values, never records — at 100 TB the record count
   is unbounded but the name vocabulary is not, and per-name record
   counts ride along as aggregates.
2. **Block before comparing.** The self-join is an equi-join on a
   blocking key (here: the first name token), so candidate pairs are
   bounded per block instead of corpus-quadratic — the same reasoning
   as LSH bands for document near-dup. A skewed hot block is an AQE
   skew-join split like any hot join key.
3. **Compare with a built-in metric.** `F.levenshtein` is a codegen
   JVM expression (and definition-identical to DuckDB's
   `levenshtein`), so the pairwise step stays off the Python path and
   the whole operator is oracle-verifiable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def record_linkage(df: DataFrame, key: str, name_col: str,
                   max_dist: int = 3) -> DataFrame:
    """Candidate duplicate-entity pairs among distinct normalized names.

    Returns (name_a, name_b, dist, n_a, n_b) with name_a < name_b:
    every within-block name pair whose edit distance is ≤ `max_dist`,
    with each side's record count. One aggregation shuffle (distinct
    names + counts) and one equi-join exchange on the block key; the
    per-pair Levenshtein runs only on block-local candidates.
    """
    name = F.lower(F.trim(F.col(name_col)))
    names = (
        df.select(name.alias("name"))
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("n_recs"))
        .withColumn("block", F.element_at(F.split(F.col("name"), " "), 1))
    )
    a = names.select(
        "block", F.col("name").alias("name_a"), F.col("n_recs").alias("n_a")
    )
    b = names.select(
        "block", F.col("name").alias("name_b"), F.col("n_recs").alias("n_b")
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, "block")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(dist <= max_dist)
        .select("name_a", "name_b", dist.cast("long").alias("dist"),
                "n_a", "n_b")
    )


def resolve_entities(df: DataFrame, key: str, name_col: str,
                     max_dist: int = 3, max_iters: int = 10) -> DataFrame:
    """Canonical-name assignment: every record keeps its key and gains
    the lexicographically-smallest name in its fuzzy-match cluster.

    Clusters are connected components of the record_linkage pair graph
    by min-label propagation (the operators/graph.py pattern, on
    string labels — `least` over a set is order- and partitioning-
    invariant): labels move through the slim name graph, records join
    the final label table once. Names with no fuzzy neighbor
    canonicalize to themselves. Blocking bounds component diameter, so
    a small fixed iteration count converges; labels are
    localCheckpointed per round to cut lineage growth.
    """
    pairs = record_linkage(df, key, name_col, max_dist).select(
        F.col("name_a").alias("src"), F.col("name_b").alias("dst")
    )
    und = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    name = F.lower(F.trim(F.col(name_col)))
    labels = (
        df.select(name.alias("node")).distinct()
        .withColumn("lab", F.col("node"))
        .localCheckpoint()
    )
    try:
        for _ in range(max_iters):
            msgs = (
                und.join(labels, und.src == labels.node)
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min("lab").alias("msg"))
            )
            stepped = labels.join(msgs, "node", "left").select(
                "node",
                F.least(
                    F.col("lab"), F.coalesce(F.col("msg"), F.col("lab"))
                ).alias("lab"),
            ).localCheckpoint()
            changed = (
                stepped.alias("s")
                .join(labels.alias("l"), "node")
                .filter(F.col("s.lab") != F.col("l.lab"))
                .limit(1)
                .count()
            )
            labels = stepped
            if changed == 0:
                break
    finally:
        und.unpersist()
    return (
        df.select(F.col(key), name.alias("name"))
        .join(labels, F.col("name") == F.col("node"))
        .select(key, "name", F.col("lab").alias("canonical_name"))
    )
