"""Run metrics via Spark observable metrics (SURVEY.md §2A op 24, §2B D11).

The reference accumulates record counts driver-side as it iterates
(/root/reference/lambda/lambda_function.py:96-98,124-127). The naive
Spark translation — `df.count()` then `df.write` — scans the data twice.
`df.observe(Observation, ...)` attaches accumulator-backed aggregates to
the WRITE job itself: one pass, exact metrics, no extra cost at any
scale. This is the mechanism behind the "monitoring.metrics" config the
reference declares but never implements (config/config.json:64-68).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_load(df: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach (n_records, n_null_ids, distinct-ish source count) to the
    next action on `df`. Read `obs.get` AFTER the action completes."""
    obs = Observation()
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_records"),
        F.count(F.when(F.col("record_id").isNull(), 1)).alias("n_null_ids"),
    )
    return observed, obs


def observed_count(df: DataFrame) -> tuple[DataFrame, Observation]:
    """Minimal variant: just the row count, free with the next action."""
    obs = Observation()
    return df.observe(obs, F.count(F.lit(1)).alias("n_records")), obs
