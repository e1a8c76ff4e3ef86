"""Skew mitigation: salted two-phase aggregation and salted broadcast-
replicated joins (SURVEY.md §7 risk 7 — "salted keys for skew").

AQE's skew-join splitting (on in session.py) handles sort-merge joins
whose *partitions* are skewed; these helpers cover the cases AQE can't:
a groupBy where one key holds 30% of all rows (the partial aggregate
still funnels that key to one reducer), and joins against a
replicable-but-not-tiny side. Both are pure DataFrame compositions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def with_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): hash of the full row.

    Row-content hashing keeps the operator deterministic (re-runs and
    retries land rows in the same salt bucket) while spreading the rows
    of any hot key that has more than one distinct row across buckets.
    """
    return df.withColumn(
        _SALT, F.pmod(F.abs(F.hash(*[F.col(c) for c in df.columns])), F.lit(n_salts))
    )


def salted_sum_count(df: DataFrame, keys: list[str], value_col: str,
                     n_salts: int = 16) -> DataFrame:
    """Two-phase skew-safe aggregation: groupBy(keys+salt) partials, then
    groupBy(keys) to combine.

    Phase 1 reduces a hot key's rows to n_salts partial rows spread over
    n_salts reducers; phase 2 combines n_salts rows per key — the hot
    reducer processes n_salts rows instead of the key's full row count.
    Output: keys, n_rows, total (decimal-exact sum presented as double).
    """
    partial = (
        with_salt(df, n_salts)
        .groupBy(*keys, _SALT)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col(value_col).cast("decimal(38,6)")).alias("__s"),
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n").alias("n_rows"),
        F.sum("__s").cast("double").alias("total"),
    )


def salted_join(skewed: DataFrame, replicated: DataFrame, on: list[str],
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: salt the skewed side, replicate the other
    side across all n_salts buckets, join on keys+salt.

    The replicated side's shuffle volume grows ×n_salts — use when it is
    orders of magnitude smaller than the skewed side but too big (or too
    hot) to broadcast outright. Supports inner/left (left = skewed side
    preserved); the salt never changes join semantics because every
    (key, salt) pair exists on the replicated side.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    left = with_salt(skewed, n_salts)
    right = replicated.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = left.join(right, on + [_SALT], how)
    return joined.drop(_SALT)


def top_keys(df: DataFrame, keys: list[str], n: int = 10) -> DataFrame:
    """Hot-key census: row counts of the n heaviest key groups — the
    diagnostic that decides whether salting is worth its extra shuffle."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.desc("n_rows"), *[F.asc(k) for k in keys])
        .limit(n)
    )


def key_skew_profile(df: DataFrame, keys: list[str], top: int = 10,
                     hot_factor: int = 5) -> DataFrame:
    """The detector that decides when the two mitigations above are
    needed: per-key row-count concentration for a prospective join/agg
    key. Reports the `top` heaviest keys with their share of all rows,
    their ratio to the mean key size, and an exact integer hot flag
    (cnt · n_keys > hot_factor · n_rows, i.e. more than hot_factor×
    the mean) — the planning signal a 100 TB pipeline computes BEFORE
    shuffling on a key, not after the straggler shows up.

    Shape: one map-combined groupBy(keys) count, a 1-row stats
    aggregate over the (already small) counts stream, and a top-k via
    orderBy+limit — which plans as TakeOrderedAndProject, a per-
    partition k-heap, NOT a global sort. The 1-row stats frame rides a
    broadcast cross join (the bounded q_scalar_subquery pattern).
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    stats = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
    )
    topk = counts.orderBy(
        F.desc("cnt"), *[F.asc(k) for k in keys]
    ).limit(top)
    out = topk.crossJoin(F.broadcast(stats))
    return out.select(
        *keys, "cnt", "n_keys", "n_rows",
        F.round(F.col("cnt").cast("double") / F.col("n_rows"), 6)
        .alias("share"),
        F.round(
            F.col("cnt").cast("double") * F.col("n_keys") / F.col("n_rows"),
            6,
        ).alias("skew_ratio"),
        # widened to DECIMAL(38,0): cnt·n_keys on a trillion-row table
        # exceeds int64 (ANSI mode would fault, non-ANSI would wrap the
        # hottest key to not-hot) — still integer-exact, never rounded
        (F.col("cnt").cast("decimal(38,0)") * F.col("n_keys")
         > F.lit(int(hot_factor))
         * F.col("n_rows").cast("decimal(38,0)")).alias("is_hot"),
    )
