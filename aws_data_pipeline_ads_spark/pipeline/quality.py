"""Data-quality layer (SURVEY.md §2B D2–D4).

The reference *declares* remove_duplicates / validate_schema /
check_null_values (/root/reference/scripts/setup_secrets.py:112-114) but
implements none of them; this module is the real implementation.

All checks are single-pass aggregations (no collect of data rows; the
reports themselves are tiny DataFrames).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def remove_duplicates(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """D2: exact dedup — whole-row or by key columns."""
    return df.dropDuplicates(keys) if keys else df.dropDuplicates()


def null_report(df: DataFrame) -> DataFrame:
    """D4: per-column null counts in ONE aggregation pass (not a loop of
    count() actions — one job regardless of column count)."""
    aggs = [F.count(F.lit(1)).alias("__total")] + [
        F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in df.columns
    ]
    wide = df.agg(*aggs)
    # unpivot to (column, n_null, n_total)
    stack = ", ".join(f"'{c}', `{c}`" for c in df.columns)
    return wide.selectExpr(
        f"stack({len(df.columns)}, {stack}) AS (column, n_null)", "__total AS n_total"
    )


@dataclass(frozen=True)
class SchemaIssue:
    field: str
    problem: str  # 'missing' | 'type_mismatch' | 'unexpected'
    expected: str | None = None
    actual: str | None = None


def validate_schema(df: DataFrame, expected: T.StructType,
                    allow_extra: bool = True) -> list[SchemaIssue]:
    """D3: structural schema validation — names + types. Returns issues
    (empty = valid) instead of raising, matching the reference's
    never-fail-the-batch stance (lambda_function.py:104-110)."""
    actual = {f.name: f.dataType for f in df.schema.fields}
    issues: list[SchemaIssue] = []
    for f in expected.fields:
        if f.name not in actual:
            issues.append(SchemaIssue(f.name, "missing", f.dataType.simpleString(), None))
        elif actual[f.name] != f.dataType:
            issues.append(
                SchemaIssue(f.name, "type_mismatch", f.dataType.simpleString(),
                            actual[f.name].simpleString())
            )
    if not allow_extra:
        expected_names = {f.name for f in expected.fields}
        for name, dtype in actual.items():
            if name not in expected_names:
                issues.append(SchemaIssue(name, "unexpected", None, dtype.simpleString()))
    return issues


def enforce_constraints(df: DataFrame, constraints: dict[str, str]) -> DataFrame:
    """Row-level constraint checks as filters: name → SQL boolean expr.
    Returns df with one boolean column per constraint plus `__valid`."""
    out = df
    flags = []
    for name, expr in constraints.items():
        col = f"chk_{name}"
        out = out.withColumn(col, F.expr(expr))
        flags.append(F.col(col))
    valid = flags[0] if flags else F.lit(True)
    for fcol in flags[1:]:
        valid = valid & fcol
    return out.withColumn("__valid", valid)
