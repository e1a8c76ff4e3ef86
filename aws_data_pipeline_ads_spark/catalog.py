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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan for one named table (column-pruned by Catalyst).

    `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark has
    no native type for; read it as nanos-since-epoch (legacy conf) and
    convert to a micros TimestampType — the same truncation DuckDB and
    pyarrow apply, so semantics stay engine-identical.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each table as a temp view so `spark.sql` queries run."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
