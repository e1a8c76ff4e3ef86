"""Time-series regularization: resample an event stream to a fixed grid
with gap filling — the step between raw events and any
learned-on-regular-intervals consumer (forecasting features, SLO
dashboards, anomaly baselines).

Scale shape: the per-bucket aggregation is map-side combined; the spine
(every key × every bucket in ITS OWN active range) is generated with
`sequence` + explode from a 2-column (min, max) aggregate — no
cross-join against a global calendar, so a key active for a day does
not pay for a year of buckets. Forward fill is `last(..., ignorenulls)`
over the key partition — the fill window reuses the spine join's
exchange on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def resample_fill(events: DataFrame, key: str = "user_id",
                  ts_col: str = "ts", val_col: str = "value") -> DataFrame:
    """Hourly resample per key with zero-filled counts and
    forward-filled sums.

    Returns (key, bucket, n_events, bucket_sum, filled_sum): one row for
    EVERY hour between a key's first and last event — empty hours carry
    n_events = 0, NULL bucket_sum, and the most recent non-empty hour's
    sum in filled_sum. The first bucket always has data (the range
    starts at an observed event), so filled_sum is never NULL.
    """
    h = F.date_trunc("hour", F.col(ts_col))
    per_bucket = events.groupBy(F.col(key), h.alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col(val_col).cast("decimal(38,6)")).cast("double")
        .alias("bucket_sum"),
    )
    spine = (
        events.groupBy(key)
        .agg(F.min(h).alias("mn"), F.max(h).alias("mx"))
        .select(
            key,
            F.explode(
                F.sequence("mn", "mx", F.expr("interval 1 hour"))
            ).alias("h"),
        )
    )
    joined = spine.join(per_bucket, [key, "h"], "left")
    fill = W.partitionBy(key).orderBy("h").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return joined.select(
        key,
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "bucket_sum",
        F.last("bucket_sum", ignorenulls=True).over(fill).alias("filled_sum"),
    )


def hypertable_rollup(events: DataFrame, ts_col: str = "ts",
                      key: str = "event_type",
                      val_col: str = "value") -> DataFrame:
    """Multi-granularity rollup (the hypertable pattern): hour, day, and
    month aggregates in one result from ONE scan and ONE shuffle.

    Each event explodes into its 3 (level, bucket) labels BEFORE the
    aggregation, so the single map-side-combined groupBy computes every
    granularity at once. The naive formulation — aggregate hourly, then
    re-aggregate that DataFrame into day and month branches of a union —
    reads nicely but Spark does NOT materialize shared subplans: the
    plan rescans the raw table once per level (verified: 3 FileScans,
    zero ReusedExchange) — the same trap simhash_pairs_sql documents.
    Exactness: sums stay decimal(38,6) through the aggregation, so every
    level is bit-identical to the oracle's recompute-from-raw.
    """
    labels = F.array(*[
        F.struct(
            F.lit(lvl).alias("level"),
            F.date_trunc(lvl, F.col(ts_col)).alias("bucket"),
        )
        for lvl in ("hour", "day", "month")
    ])
    return (
        events.select(key, F.col(val_col), F.explode(labels).alias("lb"))
        .groupBy(
            F.col("lb.level").alias("level"),
            F.date_format("lb.bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            key,
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col(val_col).cast("decimal(38,6)")).cast("double")
            .alias("total_value"),
        )
    )


def rolling_anomaly(events: DataFrame, key: str = "event_type",
                    ts_col: str = "ts", trail: int = 24,
                    min_points: int = 12,
                    threshold: float = 3.0) -> DataFrame:
    """Rolling z-score anomaly detection over hourly event counts.

    Per series key: hourly counts, a TRAILING window of the previous
    `trail` buckets (current row excluded — the point under test must
    not contaminate its own baseline), exact-decimal sum/sum-of-squares
    partials → mean/variance in double, z = (x − μ)/σ, and a flag at
    |z| > `threshold`. Fewer than `min_points` trailing buckets (series
    start) or zero variance → NULL z, flag false.

    Scale shape: one map-side-combined groupBy on (key, hour), then
    one window exchange on the key alone — both slim (the shuffles
    carry (key, hour, count) rows, events never move twice). Decimal
    partials
    make the trailing sums order-invariant (bit-stable under any
    partitioning); the double math after them is a fixed expression
    tree, so both engines agree exactly. Empty hours are absent rows,
    not zeros — compose with resample_fill first when a silent series
    must itself alarm.
    """
    h = F.date_trunc("hour", F.col(ts_col))
    b = events.groupBy(F.col(key), h.alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    tw = (
        W.partitionBy(key).orderBy("h").rowsBetween(-trail, -1)
    )
    n = F.count("x").over(tw)
    s = F.sum(F.col("x").cast("decimal(38,6)")).over(tw).cast("double")
    s2 = F.sum((F.col("x") * F.col("x")).cast("decimal(38,6)")).over(tw).cast("double")
    mean = s / n
    var = (s2 - s * s / n) / (n - 1)
    ok = (n >= min_points) & (var > 0)
    z = F.when(ok, (F.col("x") - mean) / F.sqrt(var))
    return b.select(
        key,
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "x",
        F.round(F.when(n >= min_points, mean), 6).alias("trail_mean"),
        F.round(z, 6).alias("zscore"),
        F.coalesce(F.abs(z) > threshold, F.lit(False)).alias("is_anomaly"),
    )


def ewma_smooth(events: DataFrame, key: str = "event_type",
                ts_col: str = "ts", alpha: float = 0.25) -> DataFrame:
    """Per-series EWMA over hourly counts: y₀ = x₀, yₜ = α·xₜ + (1−α)·yₜ₋₁.

    The recurrence is inherently sequential per series — exactly the
    shape Spark's built-in window frames cannot express (the closed
    form needs (1−α)^(−rn) factors that overflow on long series), so
    this is the canonical applyInPandas stateful operator: hourly
    buckets shuffle ONCE on the series key, each group arrives as one
    Arrow batch, and a tight numpy loop carries the state. Parallelism
    is #series; state per series is O(1). The arithmetic (`α·x + (1−α)·y`
    in float64, same operation order) is engine-exact: the DuckDB twin
    runs the identical recurrence as a recursive CTE and hash-matches.
    """
    import numpy as np
    import pandas as pd

    h = F.date_trunc("hour", F.col(ts_col))
    b = events.groupBy(F.col(key), h.alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    a = float(alpha)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("h").reset_index(drop=True)
        v = pdf["x"].to_numpy(dtype="float64")
        out = np.empty_like(v)
        acc = v[0]
        out[0] = acc
        for i in range(1, len(v)):
            acc = a * v[i] + (1.0 - a) * acc
            out[i] = acc
        # Rounding and timestamp formatting stay JVM-side below:
        # numpy rounds half-to-even while both engines' ROUND is
        # half-away for positives, and strftime in pandas would bake
        # in the worker's session-timezone view of the timestamps.
        return pd.DataFrame(
            {key: pdf[key], "h": pdf["h"], "x": pdf["x"], "ewma": out}
        )

    # The operator is key-type agnostic; hardcoding `string` here would
    # coerce (or reject) e.g. a bigint user_id series key.
    key_type = events.schema[key].dataType.simpleString()
    schema = f"{key} {key_type}, h timestamp, x long, ewma double"
    return (
        b.groupBy(key).applyInPandas(fn, schema)
        .select(
            key,
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "x",
            F.round("ewma", 6).alias("ewma"),
        )
    )


def seasonal_decompose(events: DataFrame, key: str = "event_type",
                       ts_col: str = "ts", period: int = 24,
                       half: int = 12) -> DataFrame:
    """Classical additive seasonal decomposition of hourly event counts:
    x = trend + seasonal + residual (the moving-average method STL
    refines; period 24 = hour-of-day seasonality).

    * trend: centered moving average over 2·half+1 buckets (full
      windows only — series edges carry NULL trend, standard for the
      classical method).
    * seasonal: mean detrended value per (key, hour-of-day), centered
      by the series' grand detrended mean so the indices sum to ~0.
    * residual: x − trend − seasonal.

    Determinism contract (the reason this hash-matches DuckDB): every
    SUM is decimal — the detrended value is carried as the EXACT
    decimal (2·half+1)·x − trend_sum, so seasonal means divide one
    exact decimal by one exact integer — and all double arithmetic
    after the sums is a fixed scalar expression tree. Buckets are
    ROWS-based over the sorted bucket sequence (gap hours are absent
    rows, same on both engines); compose with resample_fill when a
    sparse series needs a dense spine.

    Scale shape: one map-side-combined groupBy on (key, hour), one
    window exchange on the key, one vocabulary-scale (key × 24)
    seasonal-index join — events shuffle once. The bucketed/windowed
    table `t` feeds three consumers (output, seasonal index, grand
    mean), so it is persist_tracked: without the cache Spark re-runs
    the corpus-scale groupBy+window per consumer (6 exchanges instead
    of the 2 data-sized ones)."""
    from aws_data_pipeline_ads_spark.operators.cache import persist_tracked

    span = 2 * half + 1
    h = F.date_trunc("hour", F.col(ts_col))
    b = (
        events.where(F.col(ts_col).isNotNull())
        .groupBy(F.col(key), h.alias("h"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    cw = W.partitionBy(key).orderBy("h").rowsBetween(-half, half)
    t = b.select(
        key, "h", "x",
        F.sum(F.col("x").cast("decimal(38,6)")).over(cw).alias("tsum"),
        F.count("x").over(cw).alias("tcnt"),
    ).withColumn(
        # exact decimal detrended ×span: span·x − trend_sum (full
        # windows only)
        "det_xspan",
        F.when(F.col("tcnt") == span,
               (F.col("x") * span).cast("decimal(38,6)") - F.col("tsum")),
    ).withColumn("hod", F.hour("h"))
    t = persist_tracked(t)
    seas = t.groupBy(key, "hod").agg(
        (F.sum("det_xspan").cast("double")
         / (F.lit(span) * F.count("det_xspan"))).alias("seas_raw"),
    )
    grand = t.groupBy(key).agg(
        (F.sum("det_xspan").cast("double")
         / (F.lit(span) * F.count("det_xspan"))).alias("grand_mean"),
    )
    trend = F.col("tsum").cast("double") / span
    out = (
        t.join(seas, [key, "hod"], "left")
        .join(grand, [key], "left")
        .select(
            F.col(key),
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "x",
            F.round(F.when(F.col("tcnt") == span, trend), 6).alias("trend"),
            F.round(F.when(F.col("tcnt") == span,
                           F.col("seas_raw") - F.col("grand_mean")), 6)
            .alias("seasonal"),
            F.round(
                F.when(F.col("tcnt") == span,
                       F.col("x") - trend
                       - (F.col("seas_raw") - F.col("grand_mean"))), 6)
            .alias("residual"),
        )
    )
    return out
