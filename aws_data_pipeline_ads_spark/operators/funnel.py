"""Funnel analysis: ordered multi-step conversion matching per user.

The classic ads-analytics question — of the users who VIEWED, how many
later CLICKED, and of those, how many later PURCHASED? Semantics are the
greedy sequential match every funnel engine implements (cf. ClickHouse
`windowFunnel`, Amplitude funnels): step i+1 matches at the EARLIEST
event of that type strictly AFTER the step-i match.

Spark shape: ONE shuffle. Events group to their user with the funnel
steps collected as (ts, type) structs — `collect_list(when(...))` skips
non-step events for free (collect_list drops nulls) while still grouping
over every user, so depth-0 users stay in the output. The greedy match
itself is a codegen'd `aggregate` fold over the sorted array: the
accumulator is the array of matched step timestamps, and an event
appends iff it is the next step's type and strictly later than the last
match. No self-join chain (the naive formulation is steps-1 joins), no
Python, state per user bounded by n_steps.

At 100 TB: per-user event lists are bounded by events-per-user; a
pathological hot user (bot traffic) skews its task — salt the groupBy
with a sub-key and merge the per-salt folds if that appears (the fold
accumulator composes only left-to-right, so merge = rerun fold over the
concatenated per-salt survivor arrays; operators/skew.py has the
pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(events: DataFrame, steps: list[str],
           ts_col: str = "ts", user_col: str = "user_id",
           type_col: str = "event_type") -> DataFrame:
    """Per-user greedy funnel over `steps`.

    Returns (user_id, depth, step_1_ts..step_n_ts) — depth = number of
    steps matched in order; step_i_ts is the matching event's timestamp
    rendered as a string (NULL past the reached depth).
    """
    n_steps = len(steps)
    steps_lit = F.expr(
        "array(" + ",".join("'" + s.replace("'", "''") + "'" for s in steps) + ")"
    )
    is_step = F.col(type_col).isin(list(steps))
    ev = F.when(
        is_step,
        F.struct(
            F.unix_micros(F.col(ts_col)).alias("ts_us"),
            F.col(type_col).alias("etype"),
        ),
    )
    per_user = events.groupBy(user_col).agg(
        F.array_sort(F.collect_list(ev)).alias("evs")
    )
    hits = F.aggregate(
        F.col("evs"),
        F.array().cast("array<bigint>"),
        # try_element_at, not element_at: ANSI mode is on (Spark 4
        # default) and element_at throws on out-of-bounds — the size
        # guards make OOB unreachable row-wise, but ConstantFolding can
        # pre-evaluate subtrees eagerly on the driver.
        lambda acc, x: F.when(
            (F.size(acc) < n_steps)
            & (x["etype"] == F.try_element_at(steps_lit, F.size(acc) + 1))
            & ((F.size(acc) == 0) | (x["ts_us"] > F.try_element_at(acc, F.lit(-1)))),
            F.concat(acc, F.array(x["ts_us"])),
        ).otherwise(acc),
    )
    out = per_user.select(user_col, hits.alias("hits")).select(
        user_col,
        F.size("hits").cast("long").alias("depth"),
        *[
            F.date_format(
                F.timestamp_micros(F.try_element_at("hits", F.lit(i + 1))),
                "yyyy-MM-dd HH:mm:ss.SSSSSS",
            ).alias(f"step_{i + 1}_ts")
            for i in range(n_steps)
        ],
    )
    return out


def funnel_summary(per_user_funnel: DataFrame) -> DataFrame:
    """Step-level conversion counts from `funnel` output: users reaching
    at least each depth. Map-side-combined single-row aggregation."""
    n_steps = sum(
        1 for f in per_user_funnel.schema.fieldNames() if f.startswith("step_")
    )
    return per_user_funnel.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        *[
            F.sum((F.col("depth") >= i + 1).cast("long")).alias(f"reached_{i + 1}")
            for i in range(n_steps)
        ],
    )


def cohort_retention(events: DataFrame, ts_col: str = "ts",
                     user_col: str = "user_id") -> DataFrame:
    """Weekly cohort retention matrix: users bucketed by first-activity
    week (cohort), counted in each subsequent activity week.

    Returns (cohort_week, week_offset, n_users) — the retention triangle
    every ads/product dashboard draws. COUNT(*) is exact-distinct here
    by construction: activity rows are pre-distinct per (user, week) and
    a user has exactly one cohort, so each user contributes at most one
    row per (cohort_week, week_offset) group — no count_distinct shuffle
    needed.

    Week offsets are computed in epoch micros; both week-truncations are
    Monday-midnight in the session timezone (callers go through
    ensure_utc), so the difference is an exact multiple of a week and
    the double division is exact.
    """
    first = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort")
    )
    act = events.select(
        user_col, F.date_trunc("week", F.col(ts_col)).alias("wk")
    ).distinct()
    off = (
        (F.unix_micros("wk") - F.unix_micros("cohort")) / F.lit(604_800_000_000)
    ).cast("long")
    return (
        act.join(first, user_col)
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            off.alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def markov_transitions(events: DataFrame) -> DataFrame:
    """First-order event-type transition matrix (behavioral Markov
    chain): per user, in (ts, event_id) order, count src→dst pairs and
    normalize per src row.

    Two exchanges: the per-user lead window (hash on user_id — the same
    exchange sessionize uses; per-user state bounded by events-per-
    user), then the (src,dst) pair count (map-side combined; the pair
    space is |event_types|² — tiny). The per-src total rides a window
    over the COUNTED matrix (≤ |types|² rows), not the event stream.
    p is an exact integer ratio — engine-identical doubles.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id", "ts", "event_id",
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_src = W.partitionBy("src")
    return pairs.select(
        "src", "dst", "n",
        (F.col("n") / F.sum("n").over(per_src)).alias("p"),
    )


def rfm_scores(events: DataFrame, ref_date: str = "2025-01-01",
               purchase_type: str = "purchase") -> DataFrame:
    """RFM segmentation: per-user Recency (days from last event to the
    reference date), Frequency (event count), Monetary (decimal-exact
    purchase value), each scored 1-5 against the corpus's exact
    quintile thresholds.

    Scale posture: the naive formulation is ntile(5) OVER (ORDER BY
    metric) — a single-task global sort at 100 TB. Instead the 12
    thresholds (p20/p40/p60/p80 × 3 metrics) come from ONE exact-
    percentile aggregate (1 row, broadcast) and scoring is a codegen'd
    CASE per row — no global ordering anywhere. Boundary ties score
    identically in any engine (pure comparisons).
    """
    from aws_data_pipeline_ads_spark.functions import dec_sum

    per_user = events.groupBy("user_id").agg(
        F.datediff(
            F.lit(ref_date).cast("date"), F.max("ts").cast("date")
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        dec_sum(
            F.when(F.col("event_type") == purchase_type, F.col("value"))
            .otherwise(F.lit(0.0)),
            "monetary",
        ),
    )
    qs = [0.2, 0.4, 0.6, 0.8]
    thresholds = per_user.agg(
        F.percentile("recency_days", F.array(*[F.lit(q) for q in qs])).alias("tr"),
        F.percentile("frequency", F.array(*[F.lit(q) for q in qs])).alias("tf"),
        F.percentile("monetary", F.array(*[F.lit(q) for q in qs])).alias("tm"),
    )

    def score(col, t, invert=False):
        # 1 + number of thresholds strictly below the value (ties take
        # the lower band); recency inverts (smaller = better = 5)
        raw = (
            F.lit(1)
            + F.when(F.col(col) > F.element_at(t, 1), 1).otherwise(0)
            + F.when(F.col(col) > F.element_at(t, 2), 1).otherwise(0)
            + F.when(F.col(col) > F.element_at(t, 3), 1).otherwise(0)
            + F.when(F.col(col) > F.element_at(t, 4), 1).otherwise(0)
        )
        return (F.lit(6) - raw) if invert else raw

    return (
        per_user.join(F.broadcast(thresholds))
        .select(
            "user_id", "recency_days", "frequency", "monetary",
            score("recency_days", F.col("tr"), invert=True).alias("r_score"),
            score("frequency", F.col("tf")).alias("f_score"),
            score("monetary", F.col("tm")).alias("m_score"),
        )
    )


def linear_attribution(events: DataFrame, lookback_days: int = 7) -> DataFrame:
    """Linear multi-touch attribution: each purchase's value is split
    equally across the user's clicks in the preceding `lookback_days`
    window; per click, the credited value across every conversion it
    touched.

    The ads-measurement counterpart of q_asof_lastclick (last-touch):
    last-touch gives the final click everything, linear pays the whole
    path. Plan shape: clicks ⋈ purchases is an equi-join on user_id
    with the time window as a residual predicate (AQE skew-splittable
    on hot users); the per-purchase touch count is a window over the
    join output keyed by purchase (no second scan); the final groupBy
    folds credit per click. Shuffles carry slim
    (ids, ts, value) rows only.

    Exactness: credit = value / n_touches is one double division of
    exact inputs per row; per-click totals go through exact decimal
    sums so the result is partitioning-invariant; emitted rounded to 6.
    """
    from pyspark.sql import Window as W

    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value"),
    )
    touched = clicks.join(purchases, "user_id").filter(
        (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts")
           - F.expr(f"INTERVAL {int(lookback_days)} DAYS"))
    )
    n_touch = F.count(F.lit(1)).over(W.partitionBy("purchase_id"))
    credited = touched.select(
        "click_id", "user_id", "purchase_id",
        (F.col("value") / n_touch).alias("credit"),
    )
    return (
        credited.groupBy("click_id", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.round(
                F.sum(F.col("credit").cast("decimal(38,6)")).cast("double"), 6
            ).alias("credited_value"),
        )
    )
