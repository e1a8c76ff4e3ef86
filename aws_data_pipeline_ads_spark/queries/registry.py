"""Declared-query registry: the contract between the engine and the
driver's DuckDB differential oracle (SURVEY.md §2D).

Each query pairs a Spark builder `(spark, sf_dir) -> DataFrame` with an
ANSI-SQL oracle string (None → non-SQL-expressible, rows-only check).
Builders and oracles alias every computed column identically — the
driver sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

BuildFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    build: BuildFn
    oracle: str | None
    bench: bool  # include in bench.py headline set
    doc: str


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, bench: bool = False,
          doc: str = "") -> Callable[[BuildFn], BuildFn]:
    """Decorator registering a declared query."""

    def deco(fn: BuildFn) -> BuildFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query {name}")
        REGISTRY[name] = QueryDef(name, fn, oracle, bench, doc)
        return fn

    return deco
