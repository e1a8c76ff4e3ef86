"""Sessionization: gap-based session assignment in batch.

The streaming twin (session_window + watermark) lives in
`aws_data_pipeline_ads_spark.streaming`; this batch formulation is the
oracle-checkable one (SURVEY.md §2D q_session_gap).

Scale: one shuffle on user_id; both windows reuse the same partitioning
(Spark plans a single Exchange for both window functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Assign session ids per user: a new session starts when the gap to
    the previous event exceeds `gap_seconds`. Returns per-session stats.

    Gap arithmetic is done on epoch-seconds-as-double (microsecond
    precision preserved), which is engine-invariant for identical input
    timestamps.
    """
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    epoch = F.col("ts").cast("double")
    prev = F.lag(F.col("ts")).over(w).cast("double")
    is_new = (
        F.when(prev.isNull(), F.lit(0))
        .when(epoch - prev > F.lit(float(gap_seconds)), F.lit(1))
        .otherwise(F.lit(0))
    )
    with_session = events.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(is_new).over(cum).cast("long").alias("session_id"),
    )
    return with_session.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
    )
