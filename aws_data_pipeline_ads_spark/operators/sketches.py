"""Mergeable distinct-count sketches (Apache DataSketches HLL, built in
to Spark 4 as hll_sketch_agg / hll_union_agg / hll_sketch_estimate).

Why sketches and not COUNT(DISTINCT): a raw distinct count is NOT
re-aggregatable — you cannot roll daily distinct users up to monthly by
summing. A per-(group, day) HLL sketch IS: union the binary sketches
across any dimension slice and estimate once at the end. That is the
100 TB OLAP-cube pattern — materialize fine-grained partial sketches
(map-side combined, ~1.5 KB each at lgK=12), answer every rollup from
them without rescanning the fact table.

Exactness: estimates are approximate (~1.6%/sqrt(2^lgK) relative
error); the declared query is therefore rows-only at the driver, and
the pytest anchors pin (a) estimate-vs-exact relative error and (b)
union-of-partials == direct-sketch equality, which IS deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_partial_sketches(df: DataFrame, keys: list[str], value_col: str,
                         lg_k: int = 12) -> DataFrame:
    """Per-key binary HLL sketches of value_col — the materializable,
    mergeable partial aggregate."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("hll_sketch")
    )


def hll_rollup(sketches: DataFrame, keys: list[str],
               sketch_col: str = "hll_sketch") -> DataFrame:
    """Roll partial sketches up to a coarser key set: union then
    estimate. Any slice of the partial-sketch table answers any rollup —
    no fact-table rescan."""
    return sketches.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col)))
        .cast("long")
        .alias("approx_distinct")
    )


# ---------------------------------------------------------------------------
# Count-Min Sketch (heavy hitters with bounded state)
# ---------------------------------------------------------------------------
#
# The frequency counterpart of the HLL pattern above: a depth × width
# integer grid whose size is FIXED regardless of corpus cardinality,
# built by one scan + one bounded groupBy, mergeable across partitions/
# days/shards by cell-wise addition. Estimates overcount only
# (est ≥ true; error ≤ 2N/width with probability 1 − 2^-depth), which
# is the safe direction for heavy-hitter screening. Unlike HLL, the
# sketch math here is engine-portable md5 arithmetic, so the DuckDB
# oracle reproduces the sketch EXACTLY — the declared query is
# hash-verified, not rows-only.

from aws_data_pipeline_ads_spark.operators.sampling import hash_u32_sql

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_bucket(col_sql: str, seed: int, width: int):
    return F.pmod(
        F.expr(hash_u32_sql(f"concat('cms{seed}|', {col_sql})")), F.lit(width)
    )


def cms_build(values: DataFrame, col: str, depth: int = CMS_DEPTH,
              width: int = CMS_WIDTH) -> DataFrame:
    """(seed, bucket, c) counts — at most depth × width rows, map-side
    combined before the one bounded exchange."""
    buckets = [
        _cms_bucket(col, i, width).alias(f"__b{i}") for i in range(depth)
    ]
    return (
        values.select(*buckets)
        .select(
            F.posexplode(F.array(*[F.col(f"__b{i}") for i in range(depth)]))
            .alias("seed", "bucket")
        )
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_heavy_hitters(values: DataFrame, col: str, k: int = 20,
                      depth: int = CMS_DEPTH,
                      width: int = CMS_WIDTH,
                      cms: DataFrame | None = None) -> DataFrame:
    """Top-k values by CMS estimate (min over the depth rows), with the
    exact count alongside so the overcount property is visible. The
    sketch is broadcast (≤ depth·width rows); the vocabulary joins it
    map-side, so the only full exchanges are the two bounded
    aggregations (sketch cells, distinct vocabulary).

    Pass `cms` to serve from an already-accumulated grid (e.g. the
    streaming sink's lake-resident state summed by cms_served) instead
    of rebuilding from `values` — cell-wise mergeability makes the two
    identical when the grid drained the same data."""
    if cms is None:
        cms = cms_build(values, col, depth, width)
    vocab = (
        values.groupBy(col)
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .select(
            F.col(col).alias("token"), "exact_count",
            *[_cms_bucket("token", i, width).alias(f"__b{i}")
              for i in range(depth)],
        )
    )
    out = vocab
    for i in range(depth):
        side = cms.filter(F.col("seed") == i).select(
            F.col("bucket").alias(f"__b{i}"), F.col("c").alias(f"__c{i}")
        )
        out = out.join(F.broadcast(side), f"__b{i}")
    est = F.least(*[F.col(f"__c{i}") for i in range(depth)])
    return (
        out.select("token", est.alias("est_count"), "exact_count")
        .orderBy(F.desc("est_count"), F.asc("token"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum values) bottom-k sketch
# ---------------------------------------------------------------------------
#
# The third mergeable-sketch tier. HLL answers "how many distinct"
# approximately; CMS answers "how often"; the KMV sketch (Bar-Yossef et
# al. 2002; Beyer et al., SIGMOD'07 "On synopses for distinct-value
# estimation under multiset operations") keeps the k smallest hash
# values of the distinct set, which makes it simultaneously
#   * a distinct-count estimator: D-hat = (k-1) / U_(k),
#   * closed under union (merge = the k smallest of the concatenation),
#     the rollup property HLL has, AND
#   * an intersection/Jaccard estimator (Beyer et al. section 5) —
#     which HLL registers cannot provide at all.
# Like the CMS (and unlike HLL's opaque binary registers), the hash is
# portable md5 arithmetic: md5 digests are FIXED-WIDTH lowercase hex,
# so lexicographic string order IS numeric 128-bit order in every
# engine, and DuckDB reproduces the sketch — and therefore the
# estimates — bit-exactly. The declared queries are hash-verified,
# not rows-only.

from pyspark.sql import Window as W

from aws_data_pipeline_ads_spark.operators.cache import persist_tracked
from aws_data_pipeline_ads_spark.operators.sampling import hex_u32_sql

KMV_K = 256


def kmv_sketch(values: DataFrame, keys: list[str], col: str,
               k: int = KMV_K) -> DataFrame:
    """Per-key bottom-k sketch: the k lexicographically smallest md5
    digests of the DISTINCT `col` values in each key group, plus the
    group's exact distinct count.

    Scale shape: one distinct over slim (keys, digest) rows, then TWO
    bounded rank passes — rows are salted by the digest's LAST two hex
    digits (uniform, and independent of the leading digits that define
    the bottom-k order), ranked per (key, salt) first so no single
    reducer ever sorts a whole key group, and the survivors (<= 256*k
    per key) are ranked per key in a second window whose input is
    constant-bounded. The exact distinct count rides the same
    exchanges: per-salt counts in pass 1, summed in pass 2 — no third
    scan of the data.

    Returns (keys..., h, rn, n_exact) with rn = 1..min(k, n_exact).
    """
    keys = list(keys)
    # NULL is not a set member (COUNT(DISTINCT) semantics) — and
    # md5(NULL)=NULL would rank FIRST under Spark's NULLS-FIRST window
    # order but LAST under DuckDB's, breaking the cross-engine contract
    d = values.where(F.col(col).isNotNull()).select(
        *keys, F.md5(F.col(col).cast("string")).alias("h")
    ).distinct()
    salt = (
        (F.expr("instr('0123456789abcdef', substr(h, 31, 1))") - 1) * 16
        + (F.expr("instr('0123456789abcdef', substr(h, 32, 1))") - 1)
    )
    w1 = W.partitionBy(*keys, "__salt")
    p1 = (
        d.withColumn("__salt", salt)
        .withColumn("__rn1", F.row_number().over(w1.orderBy("h")))
        .withColumn("__cnt", F.count(F.lit(1)).over(w1))
        .filter(F.col("__rn1") <= k)
    )
    w2 = W.partitionBy(*keys) if keys else W.partitionBy(F.lit(1))
    return (
        p1.withColumn("rn", F.row_number().over(w2.orderBy("h")))
        .withColumn(
            "n_exact",
            F.sum(
                F.when(F.col("__rn1") == 1, F.col("__cnt")).otherwise(F.lit(0))
            ).over(w2).cast("long"),
        )
        .filter(F.col("rn") <= k)
        .select(*keys, "h", F.col("rn").cast("long").alias("rn"), "n_exact")
    )


def kmv_merge(sketch: DataFrame, keys: list[str], k: int = KMV_K) -> DataFrame:
    """Roll sketches up to a coarser key set: the k smallest digests of
    the union of the fine sketches — the closure property that makes
    KMV a cube-able partial aggregate like HLL. Input is already <= k
    rows per fine key, so the rank pass is bounded by construction.
    Returns (keys..., h, rn)."""
    keys = list(keys)
    part = W.partitionBy(*keys) if keys else W.partitionBy(F.lit(1))
    return (
        sketch.select(*keys, "h").distinct()
        .withColumn("rn", F.row_number().over(part.orderBy("h")))
        .filter(F.col("rn") <= k)
        .select(*keys, "h", F.col("rn").cast("long").alias("rn"))
    )


def kmv_distinct(sketch: DataFrame, keys: list[str],
                 k: int = KMV_K) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: D-hat = (k-1)/U_(k),
    with U_(k) the k-th smallest digest normalized to [0,1) by its
    first 8 hex digits; exact when the group holds <= k distinct values
    (the sketch IS the set then). Both branches are md5 + one IEEE
    division each — engine-portable, so the DuckDB oracle reproduces
    the estimates bit-exactly."""
    keys = list(keys)
    kth = sketch.filter(F.col("rn") == F.least(F.col("n_exact"), F.lit(k)))
    u = F.expr(hex_u32_sql("h")).cast("double") / F.lit(4294967296.0)
    est = F.when(
        F.col("n_exact") <= k, F.col("n_exact").cast("double")
    ).otherwise(F.round(F.lit(float(k - 1)) / u, 6))
    return kth.select(
        *keys,
        F.col("n_exact").alias("n_distinct_exact"),
        est.alias("est_distinct"),
    )


def kmv_union_jaccard(sketch: DataFrame, key: str,
                      k: int = KMV_K) -> DataFrame:
    """Pairwise Jaccard estimates between every two key groups from
    their KMV sketches ALONE (Beyer et al. section 5): with K the
    bottom-k of the union of two sketches, J-hat = |{h in K : h in A
    and h in B}| / |K|. Membership needs only the per-group sketches —
    h in A and h among the k smallest of A union B implies h is among
    the k smallest of A, so the sketch row is guaranteed present.

    Scale shape (r13 rewrite, guide §2.4/§1.2): each key's sketch is
    folded into ONE row carrying its sorted digest array (<= k elements
    by construction — a bounded collect_list, and its groupBy reuses
    the sketch build's own per-key hash partitioning, so it adds no
    exchange). The pair fusion is then a dim-sized broadcast theta
    self-join (key-values x key-values, NOT corpus-sized) whose union
    bottom-k / membership counts are pure JVM array expressions —
    array_union + array_sort over <= 2k elements per pair. The previous
    shape expanded sketch rows through two broadcast joins, a
    (src_a, src_b, h) re-aggregation and a pair window: 6 exchanges and
    ~10 AQE stage-jobs per run doing what one projection now does. The
    sketch-array table is persisted because the self-join consumes it
    twice (it would otherwise replay the corpus-side distinct + rank
    lineage per side)."""
    sk_arr = persist_tracked(
        sketch.groupBy(F.col(key).alias("__k"))
        .agg(F.sort_array(F.collect_list("h")).alias("hs"))
    )
    a = sk_arr.select(F.col("__k").alias("src_a"), F.col("hs").alias("ha"))
    b = sk_arr.select(F.col("__k").alias("src_b"), F.col("hs").alias("hb"))
    pairs = a.join(F.broadcast(b), F.col("src_a") < F.col("src_b"))
    union_sorted = F.array_sort(F.array_union(F.col("ha"), F.col("hb")))
    merged = F.slice(union_sorted, 1, k)  # bottom-k of the union
    n_both = F.size(
        F.array_intersect(F.array_intersect(merged, F.col("ha")),
                          F.col("hb"))
    ).cast("long")
    k_union = F.least(F.size(union_sorted), F.lit(k)).cast("long")
    return pairs.select(
        "src_a", "src_b",
        k_union.alias("k_union"),
        n_both.alias("n_both"),
        F.round(
            n_both.cast("double") / k_union.cast("double"), 6
        ).alias("est_jaccard"),
    )


def kmv_distinct_estimate(sketch: DataFrame, keys: list[str],
                          k: int = KMV_K) -> DataFrame:
    """Distinct estimate from a sketch WITHOUT an exact-count column —
    the streaming/merged case, where per-contributor exact counts do
    not add up across batches. A merged sketch holding fewer than k
    digests is still EXACT: any contributor that hit the k cap would
    alone have contributed k digests, so < k rows means every
    contributor was complete and the union is the true distinct set.
    At exactly k rows the (k-1)/U_(k) estimator applies."""
    keys = list(keys)
    part = W.partitionBy(*keys) if keys else W.partitionBy(F.lit(1))
    last = sketch.withColumn("__n", F.max("rn").over(part)).filter(
        F.col("rn") == F.col("__n")
    )
    u = F.expr(hex_u32_sql("h")).cast("double") / F.lit(4294967296.0)
    est = F.when(
        F.col("__n") < k, F.col("__n").cast("double")
    ).otherwise(F.round(F.lit(float(k - 1)) / u, 6))
    return last.select(*keys, est.alias("est_distinct"))
