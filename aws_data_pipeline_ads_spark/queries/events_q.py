"""Event-stream queries in batch formulation (SURVEY.md §2C streaming).

True Structured Streaming twins (withWatermark / session_window /
Trigger.AvailableNow) live in `aws_data_pipeline_ads_spark.streaming`
and are integration-tested; these batch formulations are the
oracle-checkable contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_data_pipeline_ads_spark.catalog import load_table
from aws_data_pipeline_ads_spark.functions import dec_sum
from aws_data_pipeline_ads_spark.operators import relational
from aws_data_pipeline_ads_spark.operators.sessionize import (
    session_paths,
    sessionize,
)
from aws_data_pipeline_ads_spark.queries.registry import query
from aws_data_pipeline_ads_spark.session import ensure_utc


@query(
    "q_tumbling_window",
    oracle=(
        "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') "
        "AS window_start, event_type, COUNT(*) AS n_events, "
        "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value "
        "FROM events GROUP BY 1, 2"
    ),
    bench=True,
    doc="2C streaming: tumbling 1h window agg (batch formulation via "
        "F.window; epoch-aligned = date_trunc('hour'))",
)
def q_tumbling_window(spark, sf_dir):
    ensure_utc(spark)
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value", "total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "q_sliding_window",
    oracle=(
        # Spark's F.window(ts, '1 hour', '30 minutes') puts each event in
        # the two epoch-aligned 30-min-strided windows covering it; the
        # oracle materializes both starts via epoch arithmetic.
        "WITH w AS ("
        "SELECT make_timestamp(CAST(floor(epoch(ts)/1800)*1800 AS BIGINT)*1000000) "
        "AS ws, event_type, value FROM events "
        "UNION ALL "
        "SELECT make_timestamp((CAST(floor(epoch(ts)/1800)*1800 AS BIGINT)-1800)*1000000) "
        "AS ws, event_type, value FROM events) "
        "SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type, "
        "COUNT(*) AS n_events, "
        "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value "
        "FROM w GROUP BY 1, 2"
    ),
    doc="2C streaming: sliding 1h/30min window agg (batch formulation; "
        "each event lands in 2 overlapping windows)",
)
def q_sliding_window(spark, sf_dir):
    ensure_utc(spark)
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value", "total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "q_session_gap",
    oracle=(
        "WITH g AS (SELECT user_id, event_id, ts, "
        "CASE WHEN lag(ts) OVER w IS NULL THEN 0 "
        "WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS is_new "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "s AS (SELECT user_id, event_id, ts, CAST(SUM(is_new) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM g) "
        "SELECT user_id, session_id, COUNT(*) AS n_events, "
        "strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start, "
        "strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end "
        "FROM s GROUP BY user_id, session_id"
    ),
    bench=True,
    doc="2C streaming: gap-based sessionization (lag + cumulative sum)",
)
def q_session_gap(spark, sf_dir):
    ensure_utc(spark)
    return sessionize(load_table(spark, sf_dir, "events"), gap_seconds=1800)


@query(
    "q_session_paths",
    oracle=(
        "WITH g AS (SELECT user_id, event_id, ts, event_type, "
        "CASE WHEN lag(ts) OVER w IS NULL THEN 0 "
        "WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS is_new "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "s AS (SELECT user_id, event_id, ts, event_type, CAST(SUM(is_new) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM g), "
        "p AS (SELECT user_id, session_id, "
        "string_agg(event_type, '>' ORDER BY ts, event_id) AS path "
        "FROM s GROUP BY user_id, session_id) "
        "SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions "
        "FROM p GROUP BY path ORDER BY n_sessions DESC, path LIMIT 20"
    ),
    doc="sequence analytics: top-20 most common session event paths "
        "(gap-sessionized, order-deterministic via struct-sorted "
        "collection; map-side-combined path counts, TakeOrdered top-k) "
        "— sessionize.session_paths",
)
def q_session_paths(spark, sf_dir):
    ensure_utc(spark)
    return session_paths(load_table(spark, sf_dir, "events"), 1800, 20)


@query(
    "q_user_totals",
    oracle=(
        "SELECT user_id, COUNT(*) AS n_events, "
        "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value, "
        "strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_ts "
        "FROM events GROUP BY user_id"
    ),
    doc="2C streaming: batch-equivalence anchor for the stateful "
        "applyInPandasWithState operator user_running_totals "
        "(streaming/stateful.py) — final keyed state == groupBy "
        "count/sum/max(ts)",
)
def q_user_totals(spark, sf_dir):
    ensure_utc(spark)
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", "total_value"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_ts"),
        )
    )


@query(
    "q_skewed_join",
    bench=True,  # added r5: the salted-join/agg shape
    oracle=(
        # Plain join + plain group-by: the salt is a pure execution-
        # strategy change (every (key, salt) pair exists on the
        # replicated side; partials re-combine exactly), so the oracle
        # is the unsalted formulation.
        "WITH e AS (SELECT CASE WHEN user_id % 5 = 0 THEN 0 "
        "ELSE user_id END AS hot_uid, event_type, value FROM events), "
        "d AS (SELECT DISTINCT hot_uid, hot_uid % 7 AS tier FROM e) "
        "SELECT d.tier, e.event_type, COUNT(*) AS n_rows, "
        "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total "
        "FROM e JOIN d USING (hot_uid) GROUP BY 1, 2"
    ),
    doc="2C skew mitigation: a deliberately hot join key (20% of user "
        "keys collapse onto one id) joined via skew.salted_join — the "
        "hot side is salted into 16 buckets and the dimension is "
        "replicated across them, so the hot key's rows spread over 16 "
        "reducers instead of funneling to one — then aggregated via "
        "skew.salted_sum_count (two-phase partials, same 16-way "
        "spread). AQE's skew handling only splits oversized SMJ "
        "partitions; these operators cover the groupBy-funnel and "
        "replicable-dimension cases it can't (operators/skew.py)",
)
def q_skewed_join(spark, sf_dir):
    from aws_data_pipeline_ads_spark.operators import skew

    e = load_table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 5 == 0, F.lit(0).cast("long"))
        .otherwise(F.col("user_id"))
        .alias("hot_uid"),
        "event_type",
        "value",
    )
    dim = (
        e.select("hot_uid").distinct()
        .withColumn("tier", F.pmod(F.col("hot_uid"), F.lit(7)))
    )
    joined = skew.salted_join(e, dim, on=["hot_uid"], n_salts=16)
    return skew.salted_sum_count(joined, ["tier", "event_type"], "value")


@query(
    "q_json_extract",
    oracle=(
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) "
        "AS k_val FROM events"
    ),
    doc="op 8: JSON envelope field extraction (get_json_object)",
)
def q_json_extract(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
    )


@query(
    "q_json_typed",
    oracle=(
        "SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k_typed, "
        "to_json(struct_pack(event_id := event_id, event_type := event_type)) "
        "AS envelope FROM events"
    ),
    doc="op 8/21: from_json typed parse + to_json envelope serialization "
        "(both engines emit compact {\"key\":value} JSON)",
)
def q_json_typed(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_json("props", "k BIGINT").getField("k").alias("k_typed"),
        F.to_json(F.struct("event_id", "event_type")).alias("envelope"),
    )


@query(
    "q_attribution_join",
    oracle=(
        "WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts "
        "FROM events WHERE event_type = 'click'), "
        "p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, "
        "value AS purchase_value FROM events WHERE event_type = 'purchase') "
        "SELECT p.purchase_id, p.user_id, "
        "strftime(p.purchase_ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts, "
        "c.click_id, strftime(c.click_ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts, "
        "p.purchase_value "
        "FROM p JOIN c ON p.user_id = c.user_id "
        "AND c.click_ts >= p.purchase_ts - INTERVAL 30 MINUTE "
        "AND c.click_ts <= p.purchase_ts"
    ),
    doc="2C streaming: click→purchase attribution — batch twin of the "
        "watermarked stream-stream interval join "
        "(streaming.attribution_join; withWatermark is a no-op in batch, "
        "so the SAME operator runs both modes); state bounded by "
        "watermark + two-sided time condition",
)
def q_attribution_join(spark, sf_dir):
    from aws_data_pipeline_ads_spark.streaming import attribution_join

    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    return attribution_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )


@query(
    "q_funnel",
    oracle=(
        "WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events "
        "WHERE event_type = 'view' GROUP BY 1), "
        "s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e "
        "JOIN s1 USING (user_id) "
        "WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id), "
        "s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e "
        "JOIN s2 USING (user_id) "
        "WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id), "
        "u AS (SELECT DISTINCT user_id FROM events) "
        "SELECT u.user_id, "
        "CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2 "
        "WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS depth, "
        "COALESCE(strftime(t1, '%Y-%m-%d %H:%M:%S.%f'), '') AS step_1_ts, "
        "COALESCE(strftime(t2, '%Y-%m-%d %H:%M:%S.%f'), '') AS step_2_ts, "
        "COALESCE(strftime(t3, '%Y-%m-%d %H:%M:%S.%f'), '') AS step_3_ts "
        "FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id) "
        "LEFT JOIN s3 USING (user_id)"
    ),
    doc="2C ads analytics: view→click→purchase greedy funnel per user — "
        "one shuffle (collect_list + codegen'd fold) vs the oracle's "
        "3-CTE chained-min formulation; operators/funnel.py",
)
def q_funnel(spark, sf_dir):
    from aws_data_pipeline_ads_spark.operators.funnel import funnel

    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    out = funnel(ev, ["view", "click", "purchase"])
    # '' for unreached steps: NULL strings can crash pandas-side object
    # comparison in differential harnesses (bool(pd.NA) raises), and at
    # gate densities every user converts so the gap would go untested.
    return out.select(
        "user_id", "depth",
        *[F.coalesce(c, F.lit("")).alias(c)
          for c in ("step_1_ts", "step_2_ts", "step_3_ts")],
    )


@query(
    "q_cohort_retention",
    oracle=(
        "WITH f AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort "
        "FROM events GROUP BY 1), "
        "a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk "
        "FROM events), "
        "j AS (SELECT a.user_id, f.cohort, a.wk FROM a JOIN f USING (user_id)) "
        "SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week, "
        "CAST((epoch_us(wk) - epoch_us(cohort)) / 604800000000 AS BIGINT) "
        "AS week_offset, CAST(COUNT(*) AS BIGINT) AS n_users "
        "FROM j GROUP BY 1, 2"
    ),
    doc="2C ads analytics: weekly cohort retention triangle — "
        "first-activity week × activity-week offset × users; COUNT(*) "
        "is exact-distinct by construction (operators/funnel.py)",
)
def q_cohort_retention(spark, sf_dir):
    from aws_data_pipeline_ads_spark.operators.funnel import cohort_retention

    ensure_utc(spark)
    return cohort_retention(load_table(spark, sf_dir, "events"))


@query(
    "q_scd2",
    oracle=(
        "WITH o AS (SELECT user_id, event_id, event_type, ts, "
        "LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS prev FROM events), "
        "s AS (SELECT user_id, event_id, event_type, ts FROM o "
        "WHERE prev IS NULL OR prev <> event_type) "
        "SELECT user_id, event_type AS status, "
        "strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS effective_from, "
        "COALESCE(strftime(LEAD(ts) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id), '%Y-%m-%d %H:%M:%S.%f'), '') AS effective_to, "
        "(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) "
        "AS is_current, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS BIGINT) AS version FROM s"
    ),
    doc="2C warehouse: SCD Type-2 build — per-user event_type change log "
        "→ effective-dated version rows; change-detect lag + validity "
        "lead share ONE exchange (operators/scd.py)",
)
def q_scd2(spark, sf_dir):
    from aws_data_pipeline_ads_spark.operators.scd import scd2

    ensure_utc(spark)
    out = scd2(load_table(spark, sf_dir, "events"),
               key="user_id", ts_col="ts", attr_col="event_type",
               tiebreak="event_id")
    # current rows carry '' not NULL (see q_funnel note); the operator
    # itself keeps NULL = open-ended validity.
    return out.withColumn("effective_to", F.coalesce("effective_to", F.lit("")))


@query(
    "q_hll_rollup",
    oracle=(
        # the DataSketches estimate is library-specific, but its
        # ACCURACY CONTRACT is exact: lgK=12 → RSE ≈ 1.04/√4096 ≈
        # 1.6%, so |union-of-partials estimate − exact| ≤ 10% (>6σ,
        # +1 absolute slack for tiny groups) must hold per event_type;
        # the oracle pins the exact distinct counts (same
        # invariants-promotion move as q_approx_distinct). Partial-
        # union == direct-sketch equality stays pytest-pinned.
        "SELECT event_type, "
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact_users, "
        "TRUE AS est_within_bound FROM events GROUP BY event_type"
    ),
    doc="2C sketches: re-aggregatable distinct users — per-(type, day) "
        "HLL partial sketches unioned up to event_type; the mergeable "
        "OLAP-cube pattern COUNT(DISTINCT) cannot express "
        "(operators/sketches.py). Hash-checked on the union's accuracy "
        "contract: the rolled-up estimate must land within 10% of the "
        "exact per-type distinct count the oracle computes — a broken "
        "register union fails the gate, not just a pytest",
)
def q_hll_rollup(spark, sf_dir):
    from aws_data_pipeline_ads_spark.operators.sketches import (
        hll_partial_sketches,
        hll_rollup,
    )

    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    partials = hll_partial_sketches(ev, ["event_type", "day"], "user_id")
    est = hll_rollup(partials, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact_users"))
    return (
        est.join(exact, "event_type")
        .select(
            "event_type", "n_exact_users",
            (F.abs(F.col("approx_distinct") - F.col("n_exact_users"))
             <= 0.10 * F.col("n_exact_users") + 1.0)
            .alias("est_within_bound"))
        .orderBy("event_type")
    )


@query(
    "q_rolling_window",
    oracle=(
        "SELECT user_id, event_id, "
        "strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, "
        "CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing, "
        "CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) "
        "AS sum_trailing FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) "
        "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"
    ),
    doc="2C windows: trailing-1h rolling aggregate per user over a TIME "
        "range frame (not rows) — one exchange, decimal-exact sum; "
        "relational.rolling_time_window",
)
def q_rolling_window(spark, sf_dir):
    ensure_utc(spark)
    return relational.rolling_time_window(load_table(spark, sf_dir, "events"))


@query(
    "q_resample_fill",
    oracle=(
        "WITH b AS (SELECT user_id, date_trunc('hour', ts) AS h, "
        "CAST(COUNT(*) AS BIGINT) AS n_events, "
        "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS bucket_sum "
        "FROM events GROUP BY 1, 2), "
        "r AS (SELECT user_id, MIN(h) AS mn, MAX(h) AS mx FROM b GROUP BY 1), "
        "spine AS (SELECT user_id, "
        "unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM r), "
        "j AS (SELECT s.user_id, s.h, COALESCE(b.n_events, 0) AS n_events, "
        "b.bucket_sum FROM spine s LEFT JOIN b USING (user_id, h)) "
        "SELECT user_id, strftime(h, '%Y-%m-%d %H:%M:%S') AS bucket, "
        "n_events, bucket_sum, "
        "last_value(bucket_sum IGNORE NULLS) OVER "
        "(PARTITION BY user_id ORDER BY h "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum "
        "FROM j"
    ),
    doc="2C time series: hourly resample per user with zero-filled "
        "counts + forward-filled sums — per-key spine via sequence/"
        "explode (no global calendar cross-join); "
        "timeseries.resample_fill",
)
def q_resample_fill(spark, sf_dir):
    from aws_data_pipeline_ads_spark.operators.timeseries import resample_fill

    ensure_utc(spark)
    return resample_fill(load_table(spark, sf_dir, "events"))


_ROLLUP_LEVEL = (
    "SELECT '{lvl}' AS level, "
    "strftime(date_trunc('{lvl}', ts), '%Y-%m-%d %H:%M:%S') AS bucket, "
    "event_type, CAST(COUNT(*) AS BIGINT) AS n_events, "
    "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value "
    "FROM events GROUP BY 2, 3"
)


@query(
    "q_hypertable_rollup",
    oracle=(" UNION ALL ".join(
        _ROLLUP_LEVEL.format(lvl=lvl) for lvl in ("hour", "day", "month")
    )),
    doc="2C time series: hypertable continuous aggregate — hour/day/"
        "month levels with coarser levels re-aggregated from finer "
        "DECIMAL partials (one raw scan; associative, so bit-identical "
        "to the oracle's recompute-from-raw); timeseries.hypertable_rollup",
)
def q_hypertable_rollup(spark, sf_dir):
    from aws_data_pipeline_ads_spark.operators.timeseries import hypertable_rollup

    ensure_utc(spark)
    return hypertable_rollup(load_table(spark, sf_dir, "events"))


@query(
    "q_markov_transitions",
    oracle=(
        "WITH pairs AS (SELECT event_type AS src, "
        "lead(event_type) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS dst FROM events), "
        "m AS (SELECT src, dst, COUNT(*) AS n FROM pairs "
        "WHERE dst IS NOT NULL GROUP BY src, dst) "
        "SELECT src, dst, n, "
        "n / (SUM(n) OVER (PARTITION BY src)) AS p FROM m"
    ),
    doc="2C behavioral analytics: first-order event-type transition "
        "matrix (per-user lead window → pair counts → per-src "
        "normalization over the tiny counted matrix, never the event "
        "stream; operators/funnel.markov_transitions)",
)
def q_markov_transitions(spark, sf_dir):
    from aws_data_pipeline_ads_spark.operators.funnel import markov_transitions

    ensure_utc(spark)
    return markov_transitions(load_table(spark, sf_dir, "events"))


@query(
    "q_rfm",
    oracle=(
        "WITH per_user AS (SELECT user_id, "
        "datediff('day', CAST(MAX(ts) AS DATE), DATE '2025-01-01') "
        "AS recency_days, "
        "COUNT(*) AS frequency, "
        "CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value "
        "ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE) AS monetary "
        "FROM events GROUP BY user_id), "
        "t AS (SELECT "
        "quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS tr, "
        "quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS tf, "
        "quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS tm "
        "FROM per_user) "
        "SELECT user_id, recency_days, frequency, monetary, "
        "6 - (1 + CASE WHEN recency_days > tr[1] THEN 1 ELSE 0 END "
        "+ CASE WHEN recency_days > tr[2] THEN 1 ELSE 0 END "
        "+ CASE WHEN recency_days > tr[3] THEN 1 ELSE 0 END "
        "+ CASE WHEN recency_days > tr[4] THEN 1 ELSE 0 END) AS r_score, "
        "1 + CASE WHEN frequency > tf[1] THEN 1 ELSE 0 END "
        "+ CASE WHEN frequency > tf[2] THEN 1 ELSE 0 END "
        "+ CASE WHEN frequency > tf[3] THEN 1 ELSE 0 END "
        "+ CASE WHEN frequency > tf[4] THEN 1 ELSE 0 END AS f_score, "
        "1 + CASE WHEN monetary > tm[1] THEN 1 ELSE 0 END "
        "+ CASE WHEN monetary > tm[2] THEN 1 ELSE 0 END "
        "+ CASE WHEN monetary > tm[3] THEN 1 ELSE 0 END "
        "+ CASE WHEN monetary > tm[4] THEN 1 ELSE 0 END AS m_score "
        "FROM per_user, t"
    ),
    doc="2C behavioral analytics: RFM segmentation scored against "
        "exact corpus quintile thresholds from ONE percentile "
        "aggregate (broadcast 1-row) — no ntile global sort "
        "(operators/funnel.rfm_scores)",
)
def q_rfm(spark, sf_dir):
    from aws_data_pipeline_ads_spark.operators.funnel import rfm_scores

    ensure_utc(spark)
    return rfm_scores(load_table(spark, sf_dir, "events"))


_ZVAR = "(s2 - s * s / n) / (n - 1)"
_Z = f"(x - s / n) / sqrt({_ZVAR})"


@query(
    "q_anomaly_zscore",
    bench=True,  # grouped-counts + trailing-window shape, new in r4
    oracle=(
        "WITH b AS (SELECT event_type, date_trunc('hour', ts) AS h, "
        "CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2), "
        "w AS (SELECT event_type, h, x, "
        "COUNT(x) OVER tw AS n, "
        "CAST(SUM(CAST(x AS DECIMAL(38,6))) OVER tw AS DOUBLE) AS s, "
        "CAST(SUM(CAST(x * x AS DECIMAL(38,6))) OVER tw AS DOUBLE) AS s2 "
        "FROM b WINDOW tw AS (PARTITION BY event_type ORDER BY h "
        "ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)) "
        "SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS bucket, x, "
        "ROUND(CASE WHEN n >= 12 THEN s / n END, 6) AS trail_mean, "
        f"ROUND(CASE WHEN n >= 12 THEN (CASE WHEN {_ZVAR} > 0 THEN {_Z} END) "
        "END, 6) AS zscore, "
        f"COALESCE(CASE WHEN n >= 12 THEN (CASE WHEN {_ZVAR} > 0 "
        f"THEN abs({_Z}) > 3.0 END) END, FALSE) AS is_anomaly "
        "FROM w"
    ),
    doc="2C time series (anomaly detection): rolling z-score of hourly "
        "event counts against a trailing 24-bucket baseline (current "
        "row excluded, >=12 points, exact-decimal partials) — two slim "
        "exchanges (grouped counts, then the per-series window); "
        "timeseries.rolling_anomaly",
)
def q_anomaly_zscore(spark, sf_dir):
    from aws_data_pipeline_ads_spark.operators.timeseries import rolling_anomaly

    ensure_utc(spark)
    return rolling_anomaly(load_table(spark, sf_dir, "events"))


@query(
    "q_ewma",
    oracle=(
        # The recurrence yt = 0.25·xt + 0.75·yt−1 in float64, identical
        # operation order both engines (e0 literals force double math —
        # a bare 0.25 is DECIMAL in DuckDB).
        "WITH RECURSIVE b AS (SELECT event_type, date_trunc('hour', ts) "
        "AS h, CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2), "
        "r AS (SELECT event_type, h, x, ROW_NUMBER() OVER "
        "(PARTITION BY event_type ORDER BY h) AS rn FROM b), "
        "e AS (SELECT event_type, h, x, rn, CAST(x AS DOUBLE) AS ewma "
        "FROM r WHERE rn = 1 "
        "UNION ALL SELECT r.event_type, r.h, r.x, r.rn, "
        "0.25e0 * CAST(r.x AS DOUBLE) + 0.75e0 * e.ewma "
        "FROM r JOIN e ON r.event_type = e.event_type AND r.rn = e.rn + 1) "
        "SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS bucket, "
        "x, ROUND(ewma, 6) AS ewma FROM e"
    ),
    doc="2C time series (signal smoothing): per-series EWMA of hourly "
        "counts — the sequential-state recurrence as the canonical "
        "applyInPandas stateful operator (one shuffle on the series "
        "key, numpy loop carries state); DuckDB twin runs the identical "
        "float64 recurrence as a recursive CTE and hash-matches; "
        "timeseries.ewma_smooth",
)
def q_ewma(spark, sf_dir):
    from aws_data_pipeline_ads_spark.operators.timeseries import ewma_smooth

    ensure_utc(spark)
    return ewma_smooth(load_table(spark, sf_dir, "events"))


@query(
    "q_multitouch",
    oracle=(
        "WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts "
        "FROM events WHERE event_type = 'click'), "
        "p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, "
        "value FROM events WHERE event_type = 'purchase'), "
        "t AS (SELECT c.click_id, c.user_id, p.purchase_id, p.value, "
        "COUNT(*) OVER (PARTITION BY p.purchase_id) AS n "
        "FROM c JOIN p USING (user_id) "
        "WHERE c.click_ts <= p.purchase_ts "
        "AND c.click_ts >= p.purchase_ts - INTERVAL 7 DAY) "
        "SELECT click_id, user_id, CAST(COUNT(*) AS BIGINT) "
        "AS n_conversions, "
        "ROUND(CAST(SUM(CAST(value / n AS DECIMAL(38,6))) AS DOUBLE), 6) "
        "AS credited_value FROM t GROUP BY click_id, user_id"
    ),
    doc="ads measurement: linear multi-touch attribution — each "
        "purchase's value split equally across the user's clicks in the "
        "trailing 7 days (last-touch sibling: q_asof_lastclick); equi-"
        "join on user with time-window residual, per-purchase touch "
        "count as a window over the join output, exact-decimal credit "
        "fold; funnel.linear_attribution",
)
def q_multitouch(spark, sf_dir):
    from aws_data_pipeline_ads_spark.operators.funnel import linear_attribution

    ensure_utc(spark)
    return linear_attribution(load_table(spark, sf_dir, "events"))


@query(
    "q_skew_profile",
    oracle=(
        # Same synthesized hot key q_skewed_join mitigates: the profile
        # is the detector that says salting is needed there.
        "WITH e AS (SELECT CASE WHEN user_id % 5 = 0 THEN 0 "
        "ELSE user_id END AS hot_uid FROM events), "
        "c AS (SELECT hot_uid, CAST(COUNT(*) AS BIGINT) AS cnt "
        "FROM e GROUP BY 1), "
        "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys, "
        "CAST(SUM(cnt) AS BIGINT) AS n_rows FROM c), "
        "t AS (SELECT hot_uid, cnt FROM c ORDER BY cnt DESC, hot_uid "
        "LIMIT 10) "
        "SELECT t.hot_uid, t.cnt, s.n_keys, s.n_rows, "
        "ROUND(CAST(t.cnt AS DOUBLE) / s.n_rows, 6) AS share, "
        "ROUND(CAST(t.cnt AS DOUBLE) * s.n_keys / s.n_rows, 6) "
        "AS skew_ratio, "
        "(CAST(t.cnt AS DECIMAL(38,0)) * s.n_keys "
        "> 5 * CAST(s.n_rows AS DECIMAL(38,0))) AS is_hot FROM t, s"
    ),
    doc="2C skew mitigation (detector): per-key concentration profile "
        "of the join key q_skewed_join salts — top-10 keys by row "
        "count with share, ratio-to-mean, and an exact integer hot "
        "flag (cnt·n_keys > 5·n_rows); TakeOrderedAndProject top-k + "
        "1-row broadcast stats, the planning signal computed BEFORE "
        "shuffling on a key (skew.key_skew_profile)",
)
def q_skew_profile(spark, sf_dir):
    from aws_data_pipeline_ads_spark.operators import skew

    e = load_table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 5 == 0, F.lit(0).cast("long"))
        .otherwise(F.col("user_id"))
        .alias("hot_uid")
    )
    return skew.key_skew_profile(e, ["hot_uid"], top=10, hot_factor=5)


@query(
    "q_seasonal_decompose",
    bench=True,  # centered-window + seasonal-index join shape, new in r8
    oracle=(
        "WITH b AS (SELECT event_type, date_trunc('hour', ts) AS h, "
        "CAST(COUNT(*) AS BIGINT) AS x FROM events "
        "WHERE ts IS NOT NULL GROUP BY 1, 2), "
        "t AS (SELECT event_type, h, x, "
        "SUM(CAST(x AS DECIMAL(38,6))) OVER w AS tsum, "
        "COUNT(x) OVER w AS tcnt FROM b WINDOW w AS "
        "(PARTITION BY event_type ORDER BY h "
        "ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)), "
        "d AS (SELECT *, CASE WHEN tcnt = 25 THEN "
        "CAST(x * 25 AS DECIMAL(38,6)) - tsum END AS det, "
        "hour(h) AS hod FROM t), "
        "s AS (SELECT event_type, hod, CAST(SUM(det) AS DOUBLE) "
        "/ (25 * COUNT(det)) AS seas_raw FROM d GROUP BY 1, 2), "
        "g AS (SELECT event_type, CAST(SUM(det) AS DOUBLE) "
        "/ (25 * COUNT(det)) AS grand_mean FROM d GROUP BY 1) "
        "SELECT d.event_type, strftime(d.h, '%Y-%m-%d %H:%M:%S') AS "
        "bucket, d.x, "
        "ROUND(CASE WHEN d.tcnt = 25 THEN CAST(d.tsum AS DOUBLE) / 25 "
        "END, 6) AS trend, "
        "ROUND(CASE WHEN d.tcnt = 25 THEN s.seas_raw - g.grand_mean "
        "END, 6) AS seasonal, "
        "ROUND(CASE WHEN d.tcnt = 25 THEN d.x "
        "- CAST(d.tsum AS DOUBLE) / 25 - (s.seas_raw - g.grand_mean) "
        "END, 6) AS residual "
        "FROM d LEFT JOIN s ON s.event_type = d.event_type "
        "AND s.hod = d.hod "
        "LEFT JOIN g ON g.event_type = d.event_type"
    ),
    doc="2C time series: classical additive seasonal decomposition of "
        "hourly event counts — x = trend + seasonal + residual "
        "(centered 25-bucket moving average, hour-of-day seasonal "
        "indices centered by the grand detrended mean; "
        "timeseries.seasonal_decompose). The detrended value is "
        "carried as the EXACT decimal 25·x − trend_sum so every mean "
        "is one decimal/integer division — bit-deterministic across "
        "engines and partitionings. One groupBy + one window exchange "
        "+ a (key × 24) index join; events shuffle once",
)
def q_seasonal_decompose(spark, sf_dir):
    from aws_data_pipeline_ads_spark.operators.timeseries import (
        seasonal_decompose,
    )

    ensure_utc(spark)
    return seasonal_decompose(load_table(spark, sf_dir, "events"))
