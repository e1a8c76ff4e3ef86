"""Column profiling: the data-quality summary every ingestion pipeline
runs before trusting a new drop (null rates, cardinalities, value
ranges) — the declared-surface version of the reference's schema
validation + null checks (SURVEY.md D3/D4), generalized to any table.

Scale shape: ONE aggregation pass produces every statistic (count /
nulls / distinct / min / max per column); the per-column rows are then
unpivoted from the single result row with `inline` — no second scan, no
per-column jobs. The multiple exact COUNT(DISTINCT)s plan as a single
Expand (#cols × rows intermediate): acceptable to ~tens of columns; at
100 TB width swap `exact_distinct=False` to HLL sketches
(approx_count_distinct) and the Expand disappears.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _default_render(c: Column) -> Column:
    return c.cast("string")


def profile(df: DataFrame, columns: list[str] | None = None,
            renderers: dict[str, Callable[[Column], Column]] | None = None,
            exact_distinct: bool = True) -> DataFrame:
    """One row per column: (col_name, n_rows, n_nulls, n_distinct,
    min_value, max_value) — min/max rendered to strings.

    `renderers` maps a column's dataType.simpleString() (e.g. 'double',
    'timestamp') to a Column→Column rendering of the native min/max;
    default is a plain string cast. Render AFTER the min/max: the
    aggregate runs in the native type (string-min of numbers would be
    lexicographic and wrong).
    """
    cols = columns or df.columns
    renderers = renderers or {}
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    nd = F.count_distinct if exact_distinct else F.approx_count_distinct

    aggs = [F.count(F.lit(1)).cast("long").alias("__n_rows")]
    for c in cols:
        render = renderers.get(types[c], _default_render)
        aggs += [
            F.count(c).cast("long").alias(f"__cnt_{c}"),
            nd(F.col(c)).cast("long").alias(f"__nd_{c}"),
            render(F.min(c)).alias(f"__mn_{c}"),
            render(F.max(c)).alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n_rows").alias("n_rows"),
            (F.col("__n_rows") - F.col(f"__cnt_{c}")).alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_value"),
            F.col(f"__mx_{c}").alias("max_value"),
        )
        for c in cols
    ]
    return one.select(F.inline(F.array(*rows)))
