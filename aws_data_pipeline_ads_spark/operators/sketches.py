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
