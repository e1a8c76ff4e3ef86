"""Bucketed (pre-shuffled) tables for co-located joins.

At 100 TB the fact⋈fact join's shuffle is the dominant cost. Writing
both tables bucketed by the join key with the same bucket count lets
every future join/aggregation on that key run shuffle-free: each task
reads bucket i of both sides. One shuffle at write time is amortized
over every downstream query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int = 32, sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Persist `df` as a bucketed+sorted managed parquet table.

    Sorting within buckets additionally removes the sort from future
    sort-merge joins on the bucket key (plan becomes scan→join).
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   on: list[str], how: str = "inner") -> DataFrame:
    """Join two tables bucketed on `on` with equal bucket counts —
    planner sees matching hash distributions and emits no Exchange
    (assert via plans.assert_no_exchange in tests)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
