"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All declarations live in ``aws_data_pipeline_ads_spark.queries`` — one
registry shared by this contract, tests/, and bench.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aws_data_pipeline_ads_spark import queries as _q

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "q_join_flagship"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q5-alike 5-way star join) on sf0.001."""
    return _q.REGISTRY[FLAGSHIP].build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; queries absent here get the rows-only check."""
    return _q.oracle_sql()
