"""SparkSession factory tuned for this engine.

Local mode is the test harness; the same config block is what we'd ship
to a 1000-executor EMR/Glue cluster (AQE, skew-join handling, Arrow).
Cluster-only knobs (executor sizing, S3A committers) belong in the job
submit config, not here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "aws-data-pipeline-ads-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession.

    - AQE on: runtime join-strategy switching, skew splitting, partition
      coalescing — the mechanisms that keep plans healthy at 100 TB.
    - shuffle.partitions ~ cores locally; on a real cluster AQE coalesces
      from a high initial number, so this is safe to leave alone there.
    - session timezone pinned UTC so timestamp semantics match the
      DuckDB oracle and are cluster-invariant.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 4)
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # NOTE (r13, measured): canChangeCachedPlanOutputPartitioning=
        # true was tried to coalesce near-empty cache partitions
        # (q_kmv_jaccard's 32-partition ≤2k-row sketch cache) — it DID
        # collapse the cache-scan stages to 1 task, but the per-consumer
        # driver-side re-optimization of the cached plan cost MORE than
        # the tasks saved (steady 3.1-4.2 s → 4.8-5.2 s). Kept at the
        # default false.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_utc(spark: SparkSession) -> SparkSession:
    """Pin the session timezone to UTC (idempotent).

    Query builders that touch timestamps call this so results are
    deterministic regardless of who constructed the session.
    """
    if spark.conf.get("spark.sql.session.timeZone", "") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
