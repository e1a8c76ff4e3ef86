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


def zorder_key(df: DataFrame, cols: list[str], bits: int = 10):
    """Z-order (Morton) curve key over `cols`: per-column min/max
    normalization to `bits`-bit buckets, then bit interleaving.

    Sorting/range-partitioning by this key clusters rows so that EVERY
    listed column's values are locally contiguous — each output file
    spans a small box of the multi-dimensional space, so file-level
    min/max statistics prune scans on ANY of the columns, not just the
    leading sort key (the Delta/Iceberg OPTIMIZE ZORDER layout,
    expressed as plain expressions).

    Returns (df_with_bounds, key_column): bounds come from one 1-row
    aggregate broadcast into the plan — no global sort, no sampling.
    """
    aggs = []
    for c in cols:
        aggs += [F.min(c).cast("double").alias(f"__mn_{c}"),
                 F.max(c).cast("double").alias(f"__mx_{c}")]
    bounds = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(bounds))
    top = (1 << bits) - 1
    buckets = []
    for c in cols:
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        span = F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
        frac = (F.col(c).cast("double") - mn) / span
        buckets.append(F.least(
            F.floor(frac * (top + 1)).cast("long"), F.lit(top)
        ))
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, bucket in enumerate(buckets):
            bit = F.shiftright(bucket, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(buckets) + i))
    return out, z


def zorder_write(df: DataFrame, cols: list[str], path: str,
                 n_files: int = 16, bits: int = 10) -> None:
    """Materialize `df` as `n_files` parquet files range-partitioned by
    the Z-order key: each file covers a compact box in every `cols`
    dimension, so min/max stats prune on any of them."""
    keyed, z = zorder_key(df, cols, bits)
    (
        keyed.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .drop("__z", *[c for c in keyed.columns if c.startswith("__mn_")
                       or c.startswith("__mx_")])
        .write.mode("overwrite").parquet(path)
    )
