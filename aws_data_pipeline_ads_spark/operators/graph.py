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


def neardup_keep_best(documents: DataFrame, pairs: DataFrame,
                      quality_col: str = "n_chars",
                      id_col: str = "doc_id",
                      max_iters: int = 30) -> DataFrame:
    """Near-dup collapse keeping the BEST document per cluster, not an
    arbitrary one.

    `neardup_clusters` marks the min-id member as canonical — fine for
    counting, wrong for curation: when a cluster holds a full article
    and three truncated scrapes of it, the dedup should keep the
    highest-quality member. This picks argmax(quality_col) per cluster
    (ties broken by min id, so the choice is total and deterministic).

    Output: (doc_id, cluster_id, cluster_size, <quality_col>, keep) for
    every document; `keep = false` rows are the drop set.

    Scale shape: connected components run over slim (id, label) pairs
    (the `connected_components` discipline — localCheckpoint per
    round); the argmax is ONE row_number window over
    (id, cluster, quality) — a single shuffle on cluster_id, document
    bodies never move.
    """
    from pyspark.sql import Window as W

    comp = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
        documents.select(F.col(id_col).alias("node")),
        max_iters=max_iters,
    )
    lab = comp.select(
        F.col("node").alias(id_col), F.col("component").alias("cluster_id")
    ).join(documents.select(id_col, quality_col), id_col)
    rank = F.row_number().over(
        W.partitionBy("cluster_id").orderBy(
            F.desc(quality_col), F.asc(id_col)
        )
    )
    return lab.select(
        id_col, "cluster_id",
        F.count(F.lit(1)).over(W.partitionBy("cluster_id")).alias(
            "cluster_size"
        ),
        quality_col,
        (rank == 1).alias("keep"),
    )


def pagerank_int(nodes: DataFrame, edges: DataFrame, iters: int = 5,
                 scale: int = 10 ** 12, damping_num: int = 17,
                 damping_den: int = 20) -> DataFrame:
    """Fixed-iteration PageRank in INTEGER arithmetic — deterministic by
    construction, which is what makes it oracle-verifiable.

    Float PageRank sums contributions in shuffle order, so two runs (or
    two engines) disagree in the last bits; this variant keeps ranks as
    integers scaled by `scale` and uses integral division everywhere
    (damping 0.85 as 17/20), so every engine computes bit-identical
    ranks. The truncation error is ≤ iters × (indegree+2) ulp of 1e-12
    — irrelevant at ranking granularity, and exactly mirrored by the
    oracle's unrolled-iteration SQL.

    Scale posture: ranks and degrees are slim (node, int64) tables; the
    corpus-sized work per iteration is one equi-join of edges against
    ranks and one map-side-combined sum — labels move, data doesn't.
    Dangling nodes (no out-edges) keep their base mass (the standard
    simplification; redistribute-dangling is a one-line aggregate if
    exact mass conservation matters). Lineage is cut per iteration with
    localCheckpoint, the connected_components discipline.

    nodes: (node) — the universe; edges: (src, dst) DIRECTED (pass both
    orientations for an undirected graph).
    """
    n = nodes.count()
    base = (3 * scale) // (damping_den * n)  # (1-d)/N, scaled: 0.15 = 3/20
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    ranks = nodes.select("node").withColumn(
        "r", F.lit(scale // n).cast("long")
    ).localCheckpoint()
    e = edges.select("src", "dst").persist()
    try:
        for _ in range(iters):
            contrib = (
                ranks.join(deg, "node")
                .select(F.col("node"), F.expr("r DIV deg").alias("c"))
                .join(e, F.col("node") == F.col("src"))
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("c").alias("s"))
            )
            ranks = nodes.select("node").join(contrib, "node", "left").select(
                "node",
                (F.lit(base) + F.expr(
                    f"({damping_num} * coalesce(s, CAST(0 AS BIGINT))) "
                    f"DIV {damping_den}"
                )).cast("long").alias("r"),
            ).localCheckpoint()
    finally:
        e.unpersist()
    return ranks.select(
        "node", F.round(F.col("r") / F.lit(float(scale)), 6).alias("rank")
    )


def strong_tie_edges(pairs_weighted: DataFrame,
                     thr_mult: float = 1.2) -> DataFrame:
    """Keep edges whose co-occurrence weight is ≥ `thr_mult` × the mean
    weight — the scale-adaptive sparsifier that makes motif analytics
    tractable on near-complete co-occurrence graphs (the raw supplier
    co-purchase graph measures density ≈ 1; triangle counting on it is
    O(n³)). The threshold is a 1-row aggregate broadcast into the
    filter — deterministic, partitioning-invariant, and it scales with
    the corpus instead of needing a hand-tuned absolute cutoff.

    pairs_weighted: (src, dst, w) with src < dst, one row per pair.
    """
    thr = pairs_weighted.agg(
        (F.lit(thr_mult) * F.avg("w")).alias("__thr")
    )
    return (
        pairs_weighted.join(F.broadcast(thr))
        .filter(F.col("w") >= F.col("__thr"))
        .select("src", "dst")
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation over an undirected graph given
    as canonical (src < dst) edges.

    The classic two-join motif plan: wedges (a<b<c with a–b, b–c) close
    against the a–c edge list — every join an equi-join on node ids
    (shuffle-partitioned, AQE-splittable), never a cross product; the
    canonical ordering counts each triangle exactly once. Per-node
    counts come from exploding the 3 corners BEFORE the final
    aggregation (map-side combined). Returns (node, n_triangles) for
    nodes in ≥ 1 triangle.
    """
    from aws_data_pipeline_ads_spark.operators.cache import persist_tracked

    # Three join legs consume the same edge list; Spark materializes no
    # shared subplans, so an unpersisted `edges` re-runs its entire
    # upstream (the corpus-sized co-occurrence aggregation) once per
    # leg — measured 13 shuffles vs 5 with the tracked persist. The
    # sparsified edge list is orders of magnitude smaller than its
    # input by construction.
    edges = persist_tracked(edges)
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = edges.select(F.col("src").alias("b2"), F.col("dst").alias("c"))
    e3 = edges.select(F.col("src").alias("a3"), F.col("dst").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
    )
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
