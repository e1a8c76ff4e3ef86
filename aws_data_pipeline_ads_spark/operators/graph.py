"""Graph operators for dedup pipelines: connected components over the
near-dup pair graph.

Near-dup detection (dedup.py / simhash.py) emits PAIRS; an actual dedup
pass needs CLUSTERS — duplicate relations are transitive in practice
(a~b, b~c => keep one of {a,b,c}), so the pipeline groups docs into
connected components and keeps one canonical doc per component. This is
the standard production composition (MinHash-LSH -> verify -> connected
components -> keep min id), cf. the public deduplication literature
(Lee et al., "Deduplicating Training Data Makes Language Models Better")
and Spark's own GraphX/GraphFrames CC.

Scale notes (100 TB):
- Min-label propagation: each round is one equi-join (edges x labels,
  both hash-partitioned on the join key) + one map-side-combined min-agg.
  Rounds = graph diameter; near-dup components are tiny and shallow in
  real corpora, so this converges in a handful of rounds. For adversarial
  long-chain graphs the alternating large-star/small-star algorithm
  (Kiveris et al., "Connected Components in MapReduce and Beyond") drops
  rounds to ~log(diameter); the per-round plan shape here is the same.
- Lineage is truncated per round via localCheckpoint — without it the
  plan doubles every iteration and the driver, not the data, becomes the
  bottleneck.
- The convergence check rides the checkpointed result (a `chg` flag
  column counted after materialization) — no extra join, no recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, nodes: DataFrame,
                         max_iters: int = 30) -> DataFrame:
    """Undirected connected components by min-label propagation.

    edges: (src, dst) pairs, any orientation, duplicates tolerated
    (min-agg is duplicate-insensitive — no distinct shuffle spent).
    nodes: (node) — the full node universe; nodes with no edges come out
    as singleton components labelled by themselves.

    Returns (node, component) where component = min node id reachable.
    Deterministic: min over a set, independent of partitioning/order.
    """
    und = edges.select(F.col("src").cast("long").alias("src"),
                       F.col("dst").cast("long").alias("dst"))
    und = und.union(und.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
    # Reused every round — materialize once.
    und = und.persist()
    labels = nodes.select(F.col("node").cast("long").alias("node")) \
                  .withColumn("lab", F.col("node")).localCheckpoint()
    try:
        for _ in range(max_iters):
            msgs = (
                und.join(labels, und.src == labels.node)
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min("lab").alias("msg"))
            )
            stepped = labels.join(msgs, "node", "left").select(
                "node",
                F.least(F.col("lab"), F.coalesce(F.col("msg"), F.col("lab"))).alias("lab"),
                (F.col("msg") < F.col("lab")).alias("chg"),
            ).localCheckpoint()
            labels = stepped.drop("chg")
            if stepped.filter(F.col("chg")).limit(1).count() == 0:
                break
    finally:
        und.unpersist()
    return labels.select("node", F.col("lab").alias("component"))


def neardup_clusters(documents: DataFrame, pairs: DataFrame,
                     id_col: str = "doc_id", max_iters: int = 30) -> DataFrame:
    """Cluster the near-dup pair graph over a corpus and pick canonicals.

    pairs: (doc_a, doc_b) from any near-dup tier (token_jaccard_pairs for
    exact/verifiable runs, verified_neardup_pairs for the 100 TB path).
    Every document appears in the output; docs with no near-dup are their
    own singleton cluster.

    Returns (doc_id, cluster_id, cluster_size, keep) — keep marks the
    canonical (min doc_id) representative of each cluster; dropping
    `keep = false` rows IS the dedup.
    """
    comp = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
        documents.select(F.col(id_col).alias("node")),
        max_iters=max_iters,
    )
    lab = comp.select(F.col("node").alias(id_col), F.col("component").alias("cluster_id"))
    # cluster_size as a window count — one shuffle on cluster_id over the
    # slim (id, cluster) table; a groupBy+join-back would shuffle twice,
    # and broadcasting the size table is wrong at scale (one row per
    # cluster is O(n_docs), not dim-sized). Document bodies never move.
    from pyspark.sql import Window as W

    return lab.select(
        id_col, "cluster_id",
        F.count(F.lit(1)).over(W.partitionBy("cluster_id")).alias("cluster_size"),
        (F.col(id_col) == F.col("cluster_id")).alias("keep"),
    )
