"""Size-aware partitioning for byte-skewed tables (media payloads).

Row-count partitioning assumes rows are the same size; a multimodal
table mixes 2 KB thumbnails with 200 MB videos, so count-balanced
partitions are byte-skewed and the largest partition dominates stage
wall-clock (the straggler problem flagged in operators/multimodal.py).

`size_balanced_partitions` rebalances by BYTES with two tiers:
- small rows hash into `ceil(total_bytes / target_bytes)` buckets —
  expected bytes per bucket ≈ target (law of large numbers; one
  aggregate job to size the bucket count, no global sort);
- rows whose single payload is ≥ target each get a DEDICATED bucket
  (a 200 MB video never shares a partition it would overflow; the
  window ordering them is over these few rows only, never the corpus).

This is the map-side shape that survives 100 TB: one bounded agg, one
hash shuffle, no global ordering of the full table.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def size_balanced_partitions(df: DataFrame, key_col: str, size_col: str,
                             target_bytes: int) -> DataFrame:
    """Repartition `df` so each partition holds ≈ `target_bytes` of
    `size_col`, with oversized rows isolated one-per-partition.

    Deterministic: bucket ids derive from xxhash64(key_col) and the
    byte sizes, not from input partitioning. Returns the repartitioned
    frame with a `__bucket` column (callers may drop it after writing).
    """
    total, n_big = df.select(
        F.sum(F.when(F.col(size_col) < target_bytes, F.col(size_col))
              .otherwise(F.lit(0))).alias("small_bytes"),
        F.sum(F.when(F.col(size_col) >= target_bytes, 1).otherwise(0)).alias("n_big"),
    ).collect()[0]
    small_bytes = int(total or 0)
    n_big = int(n_big or 0)
    n_small = max(1, math.ceil(small_bytes / target_bytes))

    big_w = W.orderBy(key_col)  # over the few oversized rows only
    small = df.filter(F.col(size_col) < target_bytes).withColumn(
        "__bucket", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_small)).cast("int")
    )
    big = df.filter(F.col(size_col) >= target_bytes).withColumn(
        "__bucket", (F.lit(n_small) + F.row_number().over(big_w) - 1).cast("int")
    )
    out = small.unionByName(big)
    return out.repartition(n_small + n_big, "__bucket")
