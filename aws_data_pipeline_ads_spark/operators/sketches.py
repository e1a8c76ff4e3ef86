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
