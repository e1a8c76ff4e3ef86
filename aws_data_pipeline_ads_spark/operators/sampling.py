"""Deterministic hash sampling (SURVEY.md §2B D10 as a real operator).

`rand(seed)`-based sampling is partitioning-dependent in Spark (the
seed is per-partition), so re-runs with different splits sample
different rows — useless for reproducible corpus construction.
Hash-gating on a KEY is partitioning-invariant, engine-portable, and
stable under re-runs, appends, and backfills: a row's membership
depends only on its key. The hash bucket is the first byte of
md5(key), derived with the same instr-over-hex-digits arithmetic the
SimHash template uses — the identical expression runs on Spark SQL and
on the DuckDB oracle, so sampling is exactly verifiable.

Stratified sampling falls out for free: a uniform hash gate keeps
≈ rate of EVERY stratum (hash is independent of any stratum column),
with no per-stratum state, shuffle, or two-pass sizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_bucket_sql(key_expr: str) -> str:
    """Portable SQL for the 0..255 bucket of md5(key_expr) — identical
    text works in Spark SQL and DuckDB (both have md5/substr/instr)."""
    d1 = f"(instr('0123456789abcdef', substr(md5({key_expr}), 1, 1)) - 1)"
    d2 = f"(instr('0123456789abcdef', substr(md5({key_expr}), 2, 1)) - 1)"
    return f"({d1} * 16 + {d2})"


def hash_sample(df: DataFrame, key_col: str, keep_of_256: int) -> DataFrame:
    """Keep rows whose md5-bucket < keep_of_256 (rate ≈ keep_of_256/256).

    Deterministic per key: the same key is always in or always out —
    which also means sampling is CONSISTENT across tables sharing the
    key (sample orders and lineitem at the same rate and the sampled
    lineitem rows still join their sampled orders).
    """
    bucket = F.expr(hash_bucket_sql(f"CAST({key_col} AS STRING)"))
    return df.filter(bucket < F.lit(int(keep_of_256)))
