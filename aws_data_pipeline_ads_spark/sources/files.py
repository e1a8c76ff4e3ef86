"""File-landing sources with schema enforcement and a corrupt-record
channel (SURVEY.md §2B D3 "validate_schema", §2A op 3 error isolation).

The reference validates nothing — a malformed API response kills the
source branch (/root/reference/lambda/lambda_function.py:104-110). Here
the Spark-idiomatic equivalent: PERMISSIVE reads route unparseable rows
to a `_corrupt_record` column instead of failing the job, and
`split_corrupt` forks them into a quarantine DataFrame so the good rows
keep flowing — per-ROW error isolation, stronger than the reference's
per-source isolation, and exactly what you want when 100 TB of scraped
JSON contains a few malformed gigabytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def with_corrupt_channel(schema: T.StructType) -> T.StructType:
    """Schema plus the corrupt-record sink column."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_json_validated(spark: SparkSession, path: str,
                        schema: T.StructType) -> DataFrame:
    """Schema-enforced JSON-lines read; bad rows land in _corrupt_record.

    PERMISSIVE (not FAILFAST) is the at-scale choice: one bad row in a
    100 TB scrape must not kill the job, and DROPMALFORMED would hide
    data loss. The quarantine column keeps the loss auditable.
    """
    return (
        spark.read.schema(with_corrupt_channel(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def parse_json_validated(df: DataFrame, json_col: str,
                         schema: T.StructType) -> DataFrame:
    """Same contract for JSON already held in a string column (the HTTP
    connector's raw payloads): from_json with a corrupt channel."""
    parsed = F.from_json(
        F.col(json_col), with_corrupt_channel(schema),
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    return df.withColumn("__p", parsed).select(
        *[c for c in df.columns if c != json_col], F.col("__p.*")
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good_rows_without_channel, quarantined_raw_rows).

    Caches `df`: Spark disallows file-scan queries that reference only
    the internal corrupt-record column (SPARK-21610), and both forks
    consume the same scan anyway — one materialization feeds both.
    Caller unpersists when done.
    """
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad


def read_csv_validated(spark: SparkSession, path: str,
                       schema: T.StructType, header: bool = True,
                       delimiter: str = ",") -> DataFrame:
    """Schema-enforced CSV read with the same quarantine contract as
    read_json_validated: PERMISSIVE routing, bad rows (wrong arity,
    uncastable values) land raw in `_corrupt_record`, `split_corrupt`
    forks them. CSV is the other format file-landing zones actually
    receive; FAILFAST/DROPMALFORMED rejected for the same 100 TB
    reasons — a job must survive bad rows and the loss must stay
    auditable."""
    return (
        spark.read.schema(with_corrupt_channel(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .csv(path)
    )
