"""feed_changes/ack_feed: per-consumer incremental change feed.

Signed deltas between acked offsets, initial load as +1 rows,
at-least-once redelivery before ack, vacuum protection through the
offset tag, and independent consumers at different offsets.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_data_pipeline_ads_spark.catalog import load_table
from aws_data_pipeline_ads_spark.lakelog import LakeTable


def _apply(state: dict, delta_df):
    """Fold a signed delta into a key→row dict (consumer simulator)."""
    for r in delta_df.collect():
        k = r["doc_id"]
        if r["__sign"] == 1:
            state[k] = (r["lang"], r["n_chars"])
        else:
            assert state.pop(k, None) is not None, f"retract unknown {k}"
    return state


def _snapshot(t):
    return {r["doc_id"]: (r["lang"], r["n_chars"])
            for r in t.read().collect()}


@pytest.fixture
def tbl(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    t = LakeTable(spark, str(tmp_path / "t"))
    t.commit(docs.filter(F.col("doc_id") % 3 < 2)
             .repartitionByRange(8, "doc_id"))
    return t, docs


def test_feed_initial_load_then_increments(spark, tbl):
    t, docs = tbl
    delta, head = t.feed_changes("job-a", "doc_id")
    state = _apply({}, delta)
    assert state == _snapshot(t)               # initial load == head
    t.ack_feed("job-a", head)
    delta, head = t.feed_changes("job-a", "doc_id")
    assert delta is None                       # nothing new
    # revisions → one consolidated signed delta
    t.commit(docs.filter(F.col("doc_id") % 3 == 2), "append")
    t.update({"doc_id": (10, 29)}, {"n_chars": F.lit(7)})
    t.delete({"doc_id": (40, 59)})
    delta, head = t.feed_changes("job-a", "doc_id")
    state = _apply(state, delta)
    assert state == _snapshot(t)
    t.ack_feed("job-a", head)
    assert t.feed_changes("job-a", "doc_id")[0] is None


def test_feed_redelivers_until_ack(spark, tbl):
    t, docs = tbl
    _, head = t.feed_changes("job-b", "doc_id")
    t.ack_feed("job-b", head)
    t.delete({"doc_id": (0, 9)})
    d1, h1 = t.feed_changes("job-b", "doc_id")
    d2, h2 = t.feed_changes("job-b", "doc_id")    # crash-before-ack twin
    assert h1 == h2
    assert sorted(map(tuple, d1.collect())) == sorted(
        map(tuple, d2.collect()))
    t.ack_feed("job-b", h1)
    assert t.feed_changes("job-b", "doc_id")[0] is None


def test_independent_consumers_and_vacuum_protection(spark, tbl):
    t, docs = tbl
    _, h0 = t.feed_changes("fast", "doc_id")
    t.ack_feed("fast", h0)
    _, _ = t.feed_changes("slow", "doc_id")
    t.ack_feed("slow", h0)
    # table moves on; only `fast` keeps up
    t.commit(docs.filter(F.col("doc_id") % 3 == 2), "append")
    d, h1 = t.feed_changes("fast", "doc_id")
    t.ack_feed("fast", h1)
    t.update({"doc_id": (0, 99)}, {"n_chars": F.lit(1)})
    # vacuum keeps everything `slow` still needs (its offset tag pins
    # version h0, whose files the next delta's old side reads)
    t.vacuum(keep_last=1)
    d_slow, h2 = t.feed_changes("slow", "doc_id")
    state = _apply({}, t.feed_changes("fresh", "doc_id")[0])
    slow_state = {r["doc_id"]: (r["lang"], r["n_chars"])
                  for r in t.read(h0).collect()}
    slow_state = _apply(slow_state, d_slow)
    assert slow_state == state == _snapshot(t)


def test_feed_ack_validates_version(spark, tbl):
    t, docs = tbl
    _, head = t.feed_changes("job-c", "doc_id")
    with pytest.raises(ValueError):
        t.ack_feed("job-c", head + 1_000)      # unknown version refused
    t.ack_feed("job-c", head)
    # restore moves head FORWARD (a new version), so feeds keep working
    t.commit(docs.limit(10), "overwrite")
    t.restore(head)
    d, h = t.feed_changes("job-c", "doc_id")
    assert h > head
    state = _apply({r["doc_id"]: (r["lang"], r["n_chars"])
                    for r in t.read(head).collect()}, d)
    assert state == _snapshot(t)
