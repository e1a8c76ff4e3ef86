"""Structured Streaming integration tests (Trigger.AvailableNow over the
parquet events table). The invariant: streaming results == the batch
formulation the oracle checks."""

from __future__ import annotations

import pandas as pd
import pytest

from aws_data_pipeline_ads_spark import streaming
from aws_data_pipeline_ads_spark.catalog import load_table
from aws_data_pipeline_ads_spark.queries import REGISTRY


@pytest.fixture(scope="module")
def ev_stream(spark, sf_dir):
    return streaming.events_stream(spark, sf_dir)


def test_tumbling_stream_matches_batch(spark, sf_dir, ev_stream, tmp_path):
    streaming.run_complete_now(
        streaming.tumbling_counts(ev_stream), "tumbling_out", str(tmp_path / "ck1")
    )
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in REGISTRY["q_tumbling_window"].build(spark, sf_dir).collect()
    }
    assert got == batch


def test_session_window_stream_runs(spark, sf_dir, ev_stream, tmp_path):
    streaming.run_complete_now(
        streaming.session_windows(ev_stream), "sessions_out", str(tmp_path / "ck2")
    )
    rows = spark.sql("SELECT * FROM sessions_out").collect()
    assert len(rows) > 0
    # sessions must not overlap per user
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.session_start, r.session_end))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
            assert e1 <= s2


def test_streaming_dedup_drops_dupes(spark, sf_dir, ev_stream, tmp_path):
    streaming.run_available_now(
        streaming.dedup_within_watermark(ev_stream), "dedup_out", str(tmp_path / "ck3")
    )
    n = spark.sql("SELECT COUNT(*) AS n FROM dedup_out").collect()[0].n
    distinct_ids = (
        spark.read.parquet(f"{sf_dir}/events.parquet").count()
    )
    assert n == distinct_ids  # event_id already unique → no rows lost


def test_sliding_stream_matches_batch(spark, sf_dir, ev_stream, tmp_path):
    streaming.run_complete_now(
        streaming.tumbling_counts(ev_stream, "1 hour", slide="30 minutes"),
        "sliding_out", str(tmp_path / "ck4"),
    )
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM sliding_out").collect()
    }
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in REGISTRY["q_sliding_window"].build(spark, sf_dir).collect()
    }
    assert got == batch


def test_stateful_running_totals_match_batch(spark, sf_dir, ev_stream, tmp_path):
    """applyInPandasWithState per-user totals == batch groupBy at drain."""
    from pyspark.sql import functions as F

    from aws_data_pipeline_ads_spark.streaming import stateful

    out = stateful.run_update_now(
        stateful.user_running_totals(ev_stream), "state_out", str(tmp_path / "ck5")
    )
    # latest emitted row per user is the final state
    final = out.sort_values("n_events").groupby("user_id").last()
    batch = {
        r.user_id: (r.n, r.total)
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert len(final) == len(batch)
    for user_id, row in final.iterrows():
        n, total = batch[user_id]
        assert row["n_events"] == n
        assert abs(row["total_value"] - total) < 1e-6 * max(1.0, abs(total))


def test_listener_collects_batch_metrics(spark, sf_dir, tmp_path):
    from aws_data_pipeline_ads_spark.streaming import listeners

    m = listeners.StreamMetrics()
    spark.streams.addListener(m)
    try:
        ev = streaming.events_stream(spark, sf_dir)
        streaming.run_complete_now(
            streaming.tumbling_counts(ev), "metered_out", str(tmp_path / "ck6")
        )
        n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        # listener-bus delivery is async; give it a moment to drain
        import time

        for _ in range(40):
            if m.total_rows() >= n_events:
                break
            time.sleep(0.25)
        assert m.total_rows() >= n_events  # all input rows observed
        assert any(b.num_input_rows > 0 for b in m.batches)
        assert any(b.state_rows and b.state_rows > 0 for b in m.batches)
        assert listeners.alerts_for(m) == []
    finally:
        spark.streams.removeListener(m)


def test_lake_sink_exactly_once_on_rerun(spark, sf_dir, tmp_path):
    """Draining twice with the same checkpoint ingests the data once —
    the restartability the reference's re-run would lack."""
    out, ck = str(tmp_path / "lake"), str(tmp_path / "ck7")
    for _ in range(2):  # second drain: no new input → no new rows
        ev = streaming.events_stream(spark, sf_dir)
        streaming.sink_to_lake(ev, out, ck)
    got = spark.read.parquet(out)
    n_src = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert got.count() == n_src
    # partition layout is Hive-style event_type=...
    assert any(p.name.startswith("event_type=") for p in (tmp_path / "lake").iterdir())


def test_stateful_state_survives_restart(spark, sf_dir, tmp_path):
    """Two AvailableNow drains over the same checkpoint, with new files
    arriving between them: the second run restores keyed state and
    accumulates — totals equal one batch pass over all data."""
    from pyspark.sql import functions as F

    from aws_data_pipeline_ads_spark.streaming import stateful

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = spark.read.parquet(f"{sf_dir}/events.parquet")
    half1 = src.filter(F.col("event_id") % 2 == 0)
    half2 = src.filter(F.col("event_id") % 2 == 1)
    land, ck = tmp_path / "landing", str(tmp_path / "ck8")
    half1.write.parquet(str(land / "batch1"))

    def drain():
        raw_schema = src.schema
        stream = (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "*.parquet")
            .parquet(f"{land}/*")
        )
        from aws_data_pipeline_ads_spark.catalog import normalize_event_ts

        ev = normalize_event_ts(stream)
        return stateful.run_update_now(
            stateful.user_running_totals(ev), "restart_out", ck
        )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    drain()                      # run 1: half the users' rows
    half2.write.parquet(str(land / "batch2"))
    out2 = drain()               # run 2: restores state, adds batch2
    final = out2.sort_values("n_events").groupby("user_id").last()
    batch = {
        r.user_id: (r.n, r.mt)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("ts").alias("mt"),
        )
        .collect()
    }
    # every user emitted in run 2 carries its FULL history, not batch2's
    import pandas as pd

    for user_id, row in final.iterrows():
        n, mt = batch[user_id]
        assert row["n_events"] == n, user_id
        # last_ts is the RUNNING max across both drains — the event_id%2
        # split makes batch2 deliver earlier-than-state timestamps, so a
        # per-batch max would regress here while the stateful running
        # max must not.
        assert row["last_ts"] == pd.Timestamp(mt), user_id


def test_stream_stream_attribution_matches_batch(spark, sf_dir, ev_stream, tmp_path):
    """Watermarked stream-stream interval join drains to exactly the
    batch twin's rows (inner join, append mode)."""
    from pyspark.sql import functions as F

    clicks = ev_stream.filter(F.col("event_type") == "click")
    purchases = ev_stream.filter(F.col("event_type") == "purchase")
    streaming.run_available_now(
        streaming.attribution_join(clicks, purchases),
        "attribution_out", str(tmp_path / "ck_attr"),
    )
    got = {tuple(r) for r in spark.sql("SELECT * FROM attribution_out").collect()}
    batch = {
        tuple(r)
        for r in REGISTRY["q_attribution_join"].build(spark, sf_dir).collect()
    }
    assert got == batch and len(batch) > 0


def test_streaming_upsert_maintains_keyed_snapshot(spark, sf_dir, tmp_path):
    """foreachBatch upsert: draining the events stream through
    latest-wins dedup per batch leaves a snapshot keyed by event_id that
    equals the batch-computed table; a second drain with the same
    checkpoint changes nothing (exactly-once)."""
    from pyspark.sql import functions as F

    from aws_data_pipeline_ads_spark.operators.upsert import streaming_upsert_sink

    target = str(tmp_path / "snapshot")
    ck = str(tmp_path / "ck_upsert")
    ev = streaming.events_stream(spark, sf_dir).select(
        "event_id", "event_type", "value"
    )
    streaming_upsert_sink(ev, target, ck, key="event_id")
    snap1 = spark.read.parquet(target)
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "event_type", "value")
    )
    assert snap1.count() == batch.select("event_id").distinct().count()
    # rerun: checkpoint replays nothing, snapshot unchanged
    streaming_upsert_sink(
        streaming.events_stream(spark, sf_dir).select(
            "event_id", "event_type", "value"
        ),
        target, ck, key="event_id",
    )
    assert spark.read.parquet(target).count() == snap1.count()


def test_streaming_funnel_matches_batch(spark, sf_dir, ev_stream, tmp_path):
    """Streaming stateful funnel (applyInPandasWithState) drained in one
    AvailableNow batch == the oracle-checked batch funnel."""
    from aws_data_pipeline_ads_spark.streaming import stateful

    out = stateful.run_update_now(
        stateful.user_funnel_state(ev_stream),
        "funnel_state_out", str(tmp_path / "ck_funnel"),
    )
    final = out.sort_values("user_id").drop_duplicates("user_id", keep="last")
    got = {
        int(r.user_id): (int(r.depth), int(r.step_1_us), int(r.step_2_us),
                         int(r.step_3_us))
        for r in final.itertuples()
    }
    import datetime as dt

    def us(s):
        if s is None or s == "":
            return -1
        return int(dt.datetime.strptime(s, "%Y-%m-%d %H:%M:%S.%f")
                   .replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)

    batch = {
        int(r.user_id): (int(r.depth), us(r.step_1_ts), us(r.step_2_ts),
                         us(r.step_3_ts))
        for r in REGISTRY["q_funnel"].build(spark, sf_dir).collect()
    }
    assert got == batch and len(batch) > 0


def test_curation_ingest_incremental_dedup(spark, sf_dir, tmp_path):
    """Streaming corpus ingestion: shard 2 re-delivers shard 1's docs —
    every re-delivered doc is flagged against the accumulated
    fingerprint manifest and dropped; only novel quality-passing docs
    land. A full re-drain with the same checkpoint ingests nothing new
    (exactly-once), and the landed corpus equals the batch composition
    (quality gate → incremental dedup) over the same shards."""
    from pyspark.sql import functions as F

    from aws_data_pipeline_ads_spark.operators import textstats
    from aws_data_pipeline_ads_spark.operators.dedup import incremental_exact_dedup

    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    shard1 = src.filter(F.col("doc_id") % 2 == 0)
    # shard 2: the odd docs PLUS a re-delivery of the even ones
    shard2 = src
    land = tmp_path / "landing"
    shard1.coalesce(1).write.parquet(str(land / "s1"))
    out, seen, ck = (str(tmp_path / p) for p in ("out", "seen", "ck_cur"))

    stream = streaming.documents_stream(spark, str(land), max_files_per_trigger=4)
    streaming.curation_ingest(stream, out, seen, ck)
    n_first = spark.read.parquet(out).count()
    assert n_first > 0

    shard2.coalesce(1).write.parquet(str(land / "s2"))
    stream = streaming.documents_stream(spark, str(land), max_files_per_trigger=4)
    streaming.curation_ingest(stream, out, seen, ck)
    got = spark.read.parquet(out)

    # batch twin: quality gate, then first-batch-wins across shards
    q = textstats.quality_stats(shard1)
    ok1 = shard1.join(q.filter(F.col("quality_ok")).select("doc_id"), "doc_id")
    f1 = incremental_exact_dedup(
        ok1, spark.createDataFrame([], "content_hash string"))
    kept1 = set(r.doc_id for r in f1.filter(F.col("keep")).collect())
    q2 = textstats.quality_stats(shard2)
    ok2 = shard2.join(q2.filter(F.col("quality_ok")).select("doc_id"), "doc_id")
    seen1 = f1.filter(F.col("keep")).select("content_hash")
    f2 = incremental_exact_dedup(ok2, seen1)
    kept2 = set(r.doc_id for r in f2.filter(F.col("keep")).collect())
    assert set(r.doc_id for r in got.collect()) == kept1 | kept2
    # every re-delivered (even) doc was caught by the manifest
    assert not (kept2 & kept1)

    # exactly-once: re-drain with no new files lands nothing new
    stream = streaming.documents_stream(spark, str(land), max_files_per_trigger=4)
    streaming.curation_ingest(stream, out, seen, ck)
    assert spark.read.parquet(out).count() == got.count()


def test_streaming_anomaly_matches_batch(spark, sf_dir, ev_stream, tmp_path):
    """Stateful streaming z-score == batch rolling_anomaly at drain:
    the latest emission per (event_type, bucket) is the batch row."""
    from aws_data_pipeline_ads_spark.streaming import stateful

    out = stateful.run_update_now(
        stateful.streaming_anomaly(ev_stream), "anom_out",
        str(tmp_path / "ck_anom"),
    )
    assert len(out) > 0
    # latest emission per key wins (update semantics); out rows are in
    # emission order, so groupby..last() is the final state
    out["bucket_s"] = out["bucket"].dt.strftime("%Y-%m-%d %H:%M:%S")
    final = out.groupby(["event_type", "bucket_s"]).last()
    batch = {
        (r.event_type, r.bucket): (r.x, r.zscore, r.is_anomaly)
        for r in REGISTRY["q_anomaly_zscore"].build(spark, sf_dir).collect()
    }
    assert len(final) == len(batch)
    for (etype, bucket), row in final.iterrows():
        x, z, flag = batch[(etype, bucket)]
        assert row["x"] == x
        if z is None:
            assert row["zscore"] is None or pd.isna(row["zscore"])
        else:
            assert abs(row["zscore"] - z) < 1e-6
        assert bool(row["is_anomaly"]) == bool(flag)


def test_streaming_cms_equals_batch_and_replay_safe(spark, sf_dir, tmp_path):
    """Heavy-hitter stream: draining the corpus through the CMS sink
    (multiple micro-batches) accumulates a sketch identical to one
    batch cms_build over all documents; re-running a batch id (crash
    replay) rewrites its partial instead of double-counting; a second
    drain over the same checkpoint adds nothing."""
    from pyspark.sql import functions as F

    from aws_data_pipeline_ads_spark.operators.sketches import cms_build

    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    land = tmp_path / "landing"
    src.filter(F.col("doc_id") % 2 == 0).coalesce(2).write.parquet(str(land / "s1"))
    src.filter(F.col("doc_id") % 2 == 1).coalesce(2).write.parquet(str(land / "s2"))
    sketch, ck = str(tmp_path / "cms"), str(tmp_path / "ck_cms")

    stream = streaming.documents_stream(spark, str(land), max_files_per_trigger=2)
    streaming.streaming_cms_sink(stream, sketch, ck)
    got = {(r.seed, r.bucket): r.c
           for r in streaming.cms_served(spark, sketch).collect()}
    tok = src.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok")
    )
    want = {(r.seed, r.bucket): r.c for r in cms_build(tok, "tok").collect()}
    assert got == want
    # crash replay: re-running an existing batch id must not double-count
    streaming.cms_merge_batch(src.filter(F.col("doc_id") % 2 == 0), 0, sketch)
    # (batch 0's partial content depends on the trigger split, so merge
    # equality is checked via a fresh id-0 overwrite being idempotent)
    streaming.cms_merge_batch(src.filter(F.col("doc_id") % 2 == 0), 0, sketch)
    once = {(r.seed, r.bucket): r.c
            for r in streaming.cms_served(spark, sketch).collect()}
    streaming.cms_merge_batch(src.filter(F.col("doc_id") % 2 == 0), 0, sketch)
    twice = {(r.seed, r.bucket): r.c
             for r in streaming.cms_served(spark, sketch).collect()}
    assert once == twice
    # second drain, same checkpoint: no new input → sketch unchanged
    stream = streaming.documents_stream(spark, str(land), max_files_per_trigger=2)
    streaming.streaming_cms_sink(stream, sketch, ck)
    again = {(r.seed, r.bucket): r.c
             for r in streaming.cms_served(spark, sketch).collect()}
    assert again == twice


def test_streaming_kmv_union_closure_and_replay_safe(spark, sf_dir, tmp_path):
    """Distinct-vocabulary stream: the bottom-k merge of per-batch KMV
    partials equals one batch kmv_sketch over all documents — union
    closure makes drain==batch EXACT (same digests, same ranks), which
    is what lets q_kmv_served share the batch arithmetic oracle. Batch
    replay overwrites its partial (idempotent); the estimator-only
    serving path agrees with the exact-count batch path on every source
    that exceeds k."""
    from pyspark.sql import functions as F

    from aws_data_pipeline_ads_spark.functions import tokens
    from aws_data_pipeline_ads_spark.operators.dedup import doc_shingle_sets
    from aws_data_pipeline_ads_spark.operators.sketches import (
        kmv_distinct,
        kmv_distinct_estimate,
        kmv_sketch,
    )

    k = 64
    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    land = tmp_path / "landing"
    src.filter(F.col("doc_id") % 2 == 0).coalesce(2).write.parquet(str(land / "s1"))
    src.filter(F.col("doc_id") % 2 == 1).coalesce(2).write.parquet(str(land / "s2"))
    sketch, ck = str(tmp_path / "kmv"), str(tmp_path / "ck_kmv")

    stream = streaming.documents_stream(spark, str(land), max_files_per_trigger=2)
    streaming.streaming_kmv_sink(stream, sketch, ck, k=k)
    served = streaming.kmv_served(spark, sketch, k=k)
    got = {(r.source, r.rn): r.h for r in served.collect()}

    toked = src.select(F.col("source").alias("doc_id"), tokens("text").alias("__toks"))
    sh = doc_shingle_sets(src, k=3, distinct=False, toked=toked).select(
        F.col("doc_id").alias("source"), "tok"
    )
    batch_sk = kmv_sketch(sh, ["source"], "tok", k=k)
    want = {(r.source, r.rn): r.h for r in batch_sk.collect()}
    assert got == want and got  # exact sketch equality, nonempty

    # replay/idempotence + dedup-for-free: landing a NEW batch id twice
    # with an already-drained subset is (a) a stable overwrite and
    # (b) a no-op on the union — a distinct sketch absorbs re-ingested
    # data, so the served state still equals the full-corpus build
    for _ in range(2):
        streaming.kmv_merge_batch(
            src.filter(F.col("doc_id") % 2 == 0), 7, sketch, k=k
        )
        again = {(r.source, r.rn): r.h
                 for r in streaming.kmv_served(spark, sketch, k=k).collect()}
        assert again == want

    # estimator-only serving == exact-count batch estimate wherever the
    # source's vocabulary exceeds k (both take the (k-1)/U_(k) branch);
    # re-serve: the pre-rewrite `served` handle lists deleted part files
    served_est = {r.source: r.est_distinct for r in
                  kmv_distinct_estimate(
                      streaming.kmv_served(spark, sketch, k=k),
                      ["source"], k=k).collect()}
    batch_est = {r.source: (r.est_distinct, r.n_distinct_exact) for r in
                 kmv_distinct(batch_sk, ["source"], k=k).collect()}
    over_cap = {s for s, (_, n) in batch_est.items() if n > k}
    assert over_cap  # the fixture corpus must exercise the estimator
    for s in over_cap:
        assert served_est[s] == batch_est[s][0]
