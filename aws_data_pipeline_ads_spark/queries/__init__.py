"""Declared query set — importing this package populates the registry."""

from aws_data_pipeline_ads_spark.queries import (  # noqa: F401
    events_q,
    ref_parity,
    relational_q,
    scalar_q,
    text_q,
    vector_q,
)
from aws_data_pipeline_ads_spark.queries.registry import REGISTRY, QueryDef

__all__ = ["REGISTRY", "QueryDef", "queries", "oracle_sql", "bench_queries"]


def queries():
    """name → (spark, sf_dir) -> DataFrame, for every declared query."""
    return {name: qd.build for name, qd in REGISTRY.items()}


def oracle_sql():
    """name → DuckDB oracle SQL (only for SQL-expressible queries)."""
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}


def bench_queries():
    """Headline queries timed by bench.py."""
    return {name: qd.build for name, qd in REGISTRY.items() if qd.bench}
