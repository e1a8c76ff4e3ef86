"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2C streaming: "stateful applyInPandasWithState").

The reference has no streaming state at all; this supplies the
charter-mandated custom-stateful-operator slot: a per-user running
aggregate whose state survives across micro-batches. State is a fixed
(count, sum, last_ts_us) triple per user — O(users) bounded state, the
shape that scales to 1000 executors (state is hash-partitioned by key
into the state store; no global structure).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, LongType, StringType, StructField,
    StructType, TimestampType,
)

if TYPE_CHECKING:  # pragma: no cover
    from typing import Any

STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
    # Running max(ts) as epoch MICROSECONDS — kept in state so the
    # emitted last_ts is the true running max even when micro-batches
    # arrive out of order (a later batch may carry earlier events).
    StructField("last_ts_us", LongType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
    StructField("last_ts", TimestampType()),
])


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into running state and
    emit the updated totals. Arrow-batched: each pdf is a columnar chunk,
    aggregated vectorized — no per-row Python."""
    (user_id,) = key
    if state.exists:
        n, total, last_us = state.get
    else:
        n, total, last_us = 0, 0.0, None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_us = pdf["ts"].max().value // 1000  # ns -> us
        if last_us is None or batch_us > last_us:
            last_us = batch_us
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total],
         "last_ts": [pd.Timestamp(last_us, unit="us")]}
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals with explicit keyed state.

    Each micro-batch emits one updated row per active user ("update"
    output). Equivalent batch formulation: groupBy(user_id).agg(count,
    sum, max(ts)) — the test anchor.
    """
    return (
        events.select("user_id", "value", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_update_now(stream_df: DataFrame, name: str, checkpoint_dir: str,
                   registry: dict | None = None) -> "Any":
    """Drain the stream with update output via foreachBatch (memory sink
    doesn't accept update mode); returns the concatenated pandas frame of
    every emitted row. Latest row per key = final state."""
    batches: list[pd.DataFrame] = []

    def sink(batch_df: DataFrame, _epoch: int) -> None:
        batches.append(batch_df.toPandas())

    q = (
        stream_df.writeStream.outputMode("update")
        .foreachBatch(sink)
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = pd.concat(batches, ignore_index=True) if batches else pd.DataFrame()
    if registry is not None:
        registry[name] = out
    return out


FUNNEL_STEPS = ("view", "click", "purchase")

FUNNEL_STATE_SCHEMA = StructType([
    # matched step timestamps as epoch micros; -1 = not reached
    StructField("t1_us", LongType()),
    StructField("t2_us", LongType()),
    StructField("t3_us", LongType()),
])

FUNNEL_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("depth", LongType()),
    StructField("step_1_us", LongType()),
    StructField("step_2_us", LongType()),
    StructField("step_3_us", LongType()),
])


def _update_funnel(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Streaming greedy funnel per user: fold this batch's (sorted)
    events into the matched-step state — same semantics as the batch
    operator (operators/funnel.py) when events arrive in order.

    Caveat (inherent to streaming funnels): a match never retracts, so
    an out-of-order event older than an existing match cannot replace
    it across micro-batches — within one batch, sorting restores order.
    The batch-equivalence test drains all data in one AvailableNow
    batch, where semantics coincide exactly.
    """
    (user_id,) = key
    hits = list(state.get) if state.exists else [-1, -1, -1]
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for etype, ts in zip(pdf["event_type"], pdf["ts"]):
            depth = sum(1 for h in hits if h >= 0)
            if depth >= len(FUNNEL_STEPS):
                break
            ts_us = ts.value // 1000
            if etype == FUNNEL_STEPS[depth] and (
                depth == 0 or ts_us > hits[depth - 1]
            ):
                hits[depth] = ts_us
    state.update(tuple(hits))
    depth = sum(1 for h in hits if h >= 0)
    yield pd.DataFrame({
        "user_id": [user_id], "depth": [depth],
        "step_1_us": [hits[0]], "step_2_us": [hits[1]], "step_3_us": [hits[2]],
    })


def user_funnel_state(events: DataFrame) -> DataFrame:
    """Streaming funnel with explicit keyed state: each micro-batch
    emits every active user's updated funnel depth + step timestamps.
    Batch twin: operators/funnel.funnel (q_funnel is the oracle-checked
    contract)."""
    return (
        events.select("user_id", "event_id", "event_type", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_funnel,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


ANOMALY_STATE_SCHEMA = StructType([
    # present hours (epoch hour index) and their running counts —
    # O(active hours) per series key, the honest state bound for a
    # trailing-ROWS baseline that must absorb out-of-order backfill
    StructField("hours", ArrayType(LongType())),
    StructField("counts", ArrayType(LongType())),
])

ANOMALY_OUTPUT_SCHEMA = StructType([
    StructField("event_type", StringType()),
    StructField("bucket", TimestampType()),
    StructField("x", LongType()),
    StructField("zscore", DoubleType()),
    StructField("is_anomaly", BooleanType()),
])

_ANOM_TRAIL = 24
_ANOM_MIN_POINTS = 12
_ANOM_THRESHOLD = 3.0


def _update_anomaly(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold a micro-batch's events into per-hour counts and re-emit the
    z-score rows whose trailing window changed.

    Semantics mirror timeseries.rolling_anomaly exactly: the baseline
    is the previous `_ANOM_TRAIL` PRESENT buckets (ROWS frame, not a
    time range — absent hours are absent, as in batch), ≥ min_points
    and positive variance required. A batch that backfills an earlier
    hour re-emits every bucket within 24 positions downstream, so
    update-mode consumers converge to the batch answer (latest emission
    per key wins). Integer sums keep mean/variance math bit-identical
    to the batch operator's exact-decimal partials."""
    import numpy as np

    (etype,) = key
    if state.exists:
        hrs, cts = state.get
        hours = dict(zip(hrs, cts))
    else:
        hours = {}
    touched = set()
    for pdf in pdfs:
        idx = pdf["ts"].astype("int64") // (3600 * 10 ** 9)  # ns → hour
        for h, c in idx.value_counts().items():
            h = int(h)
            hours[h] = hours.get(h, 0) + int(c)
            touched.add(h)
    hs = sorted(hours)
    cs = np.array([hours[h] for h in hs], dtype="int64")
    pos = {h: i for i, h in enumerate(hs)}
    affected: set = set()
    for h in touched:
        i = pos[h]
        affected.update(range(i, min(i + _ANOM_TRAIL + 1, len(hs))))
    rows = []
    for i in sorted(affected):
        x = int(cs[i])
        w = cs[max(0, i - _ANOM_TRAIL):i]
        n = len(w)
        z = None
        if n >= _ANOM_MIN_POINTS:
            s = float(w.sum())
            s2 = float((w * w).sum())
            var = (s2 - s * s / n) / (n - 1)
            if var > 0:
                z = (x - s / n) / var ** 0.5
        rows.append((
            etype,
            pd.Timestamp(hs[i] * 3600, unit="s"),
            x,
            None if z is None else round(z, 6),
            bool(z is not None and abs(z) > _ANOM_THRESHOLD),
        ))
    state.update((hs, [int(hours[h]) for h in hs]))
    yield pd.DataFrame(
        rows,
        columns=["event_type", "bucket", "x", "zscore", "is_anomaly"],
    )


def streaming_anomaly(events: DataFrame) -> DataFrame:
    """Streaming twin of timeseries.rolling_anomaly: per-event-type
    hourly counts with a trailing-24-bucket z-score, state surviving
    across micro-batches (applyInPandasWithState, update output).

    At drain over the same events, the latest emission per
    (event_type, bucket) equals the batch operator row-for-row —
    pinned by test_streaming_anomaly_matches_batch.

    Timezone: the stateful fn buckets by integer epoch division over
    the Arrow-delivered session-LOCAL naive timestamps, while the
    batch twin buckets with date_trunc('hour') in the session zone.
    Those agree only when the session offset is a whole hour; pin the
    session to UTC (as every batch query path does via ensure_utc) so
    e.g. a +05:30 session can't silently shear the streaming buckets
    half an hour off the batch ones."""
    from aws_data_pipeline_ads_spark.session import ensure_utc

    ensure_utc(events.sparkSession)
    return (
        events.select("event_type", "ts")
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_anomaly,
            outputStructType=ANOMALY_OUTPUT_SCHEMA,
            stateStructType=ANOMALY_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
