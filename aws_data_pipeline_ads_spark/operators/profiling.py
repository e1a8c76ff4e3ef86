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


def correlation(df: DataFrame, x_col: str, y_col: str,
                group_col: str | None = None) -> DataFrame:
    """Pearson correlation from EXACT decimal raw moments.

    The built-in `corr` aggregate streams Welford-style co-moments whose
    floating-point accumulation is ORDER-DEPENDENT — the answer changes
    with partitioning, which breaks this engine's partitioning-invariance
    rule (README) and any differential oracle. Instead: one map-side-
    combined pass collects the six raw moments (n, Σx, Σy, Σxy, Σx²,
    Σy²) as decimal(38,6)-exact sums — associative, order-invariant —
    and the textbook closed form runs ONCE per group on exact inputs, so
    every engine computes the identical double.

    At 100 TB: same cost class as any grouped aggregate (one shuffle of
    6 partials per group); no second pass over the data (the two-pass
    mean-centered formulation would rescan).
    """
    # per-row decimal(18,6): wide enough for per-row magnitudes here and
    # its self-product stays inside decimal-38 in BOTH Spark and DuckDB
    # (a (38,6)×(38,6) product overflows DuckDB's max width)
    x = F.col(x_col).cast("decimal(18,6)")
    y = F.col(y_col).cast("decimal(18,6)")
    keys = [group_col] if group_col else []
    moments = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((x * y).cast("decimal(38,12)")).cast("double").alias("sxy"),
        F.sum((x * x).cast("decimal(38,12)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(38,12)")).cast("double").alias("syy"),
    )
    n = F.col("n").cast("double")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / n
    vx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vy = F.col("syy") - F.col("sy") * F.col("sy") / n
    # Zero-variance guard: a constant column makes 0/0, which under
    # ANSI mode errors the job — correlation is undefined there, so
    # emit NULL (the oracle carries the same CASE).
    corr = F.when(vx * vy > 0, cov / F.sqrt(vx * vy))
    return moments.select(
        *keys,
        "n",
        F.round(corr, 6).alias("corr"),
    )


def histogram(df: DataFrame, value_col: str, group_col: str,
              bin_width: float = 50.0, lo: float = 0.0) -> DataFrame:
    """Fixed-width histogram per group: bin = floor((v - lo)/width).

    Fixed bounds instead of data-driven min/max: binning is then a pure
    per-row expression (no global-extent pre-pass, no broadcast), the
    bin ids are stable across corpus growth — the property that lets
    per-day histogram partials re-aggregate into any rollup, the same
    mergeability argument as the HLL sketches (`operators/sketches.py`).
    """
    b = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(bin_width))
    return (
        df.groupBy(F.col(group_col), b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            group_col,
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(bin_width)).alias("bin_lo"),
            "n",
        )
    )


def quantile_from_histogram(df: DataFrame, value_col: str, group_col: str,
                            qs: tuple[float, ...] = (0.5, 0.9),
                            bin_width: float = 50.0, lo: float = 0.0) -> DataFrame:
    """Approximate quantiles from the MERGEABLE fixed-bin histogram.

    percentile_approx's KLL-style sketch is accurate but its partials
    aren't re-aggregatable through SQL; the fixed-bin histogram is the
    mergeable alternative (same argument as the HLL sketches): per-day
    partials union into any rollup, and quantiles interpolate from the
    merged counts with error ≤ bin_width. Estimation: cumulative counts
    over the ≤(range/width) bins per group — the window runs on the
    COUNTED histogram, never the raw stream — then linear interpolation
    inside the first bin whose cumulative count crosses q·total.
    Deterministic: pure arithmetic on exact integer counts, so the
    DuckDB oracle reproduces it bit-for-bit.
    """
    from pyspark.sql import Window as W

    hist = histogram(df, value_col, group_col, bin_width, lo)
    w = W.partitionBy(group_col).orderBy("bin")
    wg = W.partitionBy(group_col)
    cum = hist.select(
        group_col, "bin", "bin_lo", "n",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(wg).alias("total"),
    )
    est_cols = []
    for q in qs:
        target = F.lit(q) * F.col("total")
        in_bin = F.col("cum") >= target
        est = (
            F.col("bin_lo")
            + F.lit(bin_width)
            * (target - (F.col("cum") - F.col("n"))) / F.col("n")
        )
        name = f"p{int(q * 100)}_est"
        # the FIRST crossing bin's interpolant (min_by on a key that is
        # NULL for non-crossing bins — both Spark min_by and DuckDB
        # arg_min skip null keys); a plain min-over-estimates would pick
        # a later bin whose negative-overshoot interpolant is smaller
        est_cols.append(
            F.min_by(F.round(est, 6), F.when(in_bin, F.col("bin"))).alias(name)
        )
    return cum.groupBy(group_col).agg(
        F.max("total").alias("total"), *est_cols
    )
