"""Scalar / aggregate expression helpers shared across operators.

All helpers return Column expressions built from `pyspark.sql.functions`
(JVM-side, whole-stage-codegen'd). No Python UDFs here — these are the
hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Oracle-stable aggregation
#
# Double summation is order-dependent; Spark (partial aggs per partition)
# and any other engine (e.g. a DuckDB oracle, or two cluster runs with
# different partitioning) can disagree in the low bits. Summing through a
# decimal cast is exact and order-independent, so results are identical
# no matter the partitioning — which also means deterministic results
# across cluster re-runs at 100 TB. Cast back to double for a compact
# schema. Per-row *arithmetic* stays in double (IEEE ops on identical
# inputs are engine-invariant).
# ---------------------------------------------------------------------------


def dec_sum(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Exact, partitioning-invariant SUM of a double column.

    Per-row cast is decimal(38,scale): with the default scale that holds
    |value| < 10^32, so realistic 100 TB aggregate magnitudes can't
    overflow the cast to NULL (decimal(18,6) silently dropped rows
    ≥ 10^12 in non-ANSI mode)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double").alias(alias)


def dec_avg(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Partitioning-invariant AVG: exact decimal sum / count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(f"decimal(38,{scale})")).cast("double") / F.count(c)).alias(alias)


# ---------------------------------------------------------------------------
# Reference-parity scalars (SURVEY.md §2A ops 9, 12, 13, 16)
# ---------------------------------------------------------------------------


def surrogate_key(*cols: Column | str, prefix: str | None = None, length: int = 12) -> Column:
    """Content-keyed surrogate id: substring(md5(concat_ws('_', ...)), 1, n).

    The reference salts its hash with wall-clock + batch index
    (lambda/lambda_function.py:260-261), which is non-reproducible; a
    content-keyed hash keeps the same shape (12 hex chars) while being
    deterministic and shuffle-safe.
    """
    parts: list[Column] = []
    if prefix is not None:
        parts.append(F.lit(prefix))
    for c in cols:
        col = F.col(c) if isinstance(c, str) else c
        parts.append(col.cast("string"))
    return F.substring(F.md5(F.concat_ws("_", *parts)), 1, length)


def truncate(col: Column | str, n: int = 200) -> Column:
    """Reference's `text[:200]` (lambda/lambda_function.py:280,291)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, n)


def full_name(first: Column | str, last: Column | str) -> Column:
    """Reference's f-string concat (lambda/lambda_function.py:301)."""
    f_ = F.col(first) if isinstance(first, str) else first
    l_ = F.col(last) if isinstance(last, str) else last
    return F.concat_ws(" ", f_, l_)


def cast_default(col: Column | str, default: float = 0.0, to: str = "double") -> Column:
    """Reference's `float(record.get(k, 0))` (lambda/lambda_function.py:278)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(default)).cast(to)


# ---------------------------------------------------------------------------
# Text / tokenization (LLM-data ops)
# ---------------------------------------------------------------------------

TOKEN_SPLIT_RE = r"\s+"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization as an array column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), TOKEN_SPLIT_RE)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def normalized_text(col: Column | str) -> Column:
    """Whitespace-collapsed, lower-cased text for fingerprinting."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))


def content_fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint (md5 of normalized text)."""
    return F.md5(normalized_text(col))


# ---------------------------------------------------------------------------
# Vector math over array<float|double> columns — built-in higher-order
# functions; the whole expression stays inside codegen (no Python).
# ---------------------------------------------------------------------------


def vec_dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def vec_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine of two array<double> columns; NULL when either vector has
    zero norm (undefined — and an unguarded 0/0 ERRORS under Spark 4's
    default ANSI mode instead of yielding NaN)."""
    denom = vec_norm(a) * vec_norm(b)
    return F.when(denom != 0, vec_dot(a, b) / denom)
