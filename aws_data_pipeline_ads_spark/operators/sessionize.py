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


def session_paths(events: DataFrame, gap_seconds: int = 1800,
                  k: int = 20) -> DataFrame:
    """Top-k most common session paths: the ordered event-type sequence
    of each gap-delimited session, counted corpus-wide — the clickstream
    "what do users actually do" report.

    Determinism: the path is built by sorting per-session
    (ts, event_id, event_type) STRUCTS (array_sort is lexicographic by
    field order, so ties on ts break on event_id) — collect_list alone
    is partitioning-ordered and would be nondeterministic. Scale: the
    session window reuses the sessionize exchange shape (one shuffle on
    user_id); per-session state is bounded by session length; path
    counting is map-side combined on the path string; top-k plans as a
    TakeOrderedAndProject k-heap with (count desc, path) tiebreak.
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
    labeled = events.select(
        "user_id", "event_id", "ts", "event_type",
        F.sum(is_new).over(cum).cast("long").alias("session_id"),
    )
    path = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda x: x["event_type"],
        ),
        ">",
    )
    return (
        labeled.groupBy("user_id", "session_id")
        .agg(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(k)
    )
