"""Standing CHECK constraints: a table property every write enforces.

SQL CHECK semantics (NULL passes — contrast commit_expect's DLT
expectations where unknown fails); enforced on the rows being written
by commit / merge / update, never by rescanning the table; carried
forward by every commit and by compact / restore / clone.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aws_data_pipeline_ads_spark.catalog import load_table
from aws_data_pipeline_ads_spark.lakelog import (
    ConstraintViolationError,
    LakeTable,
)


@pytest.fixture
def tbl(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    t = LakeTable(spark, str(tmp_path / "t"))
    t.commit(docs.repartitionByRange(4, "doc_id"))
    return t, docs


def test_add_validates_existing_and_gates_writes(spark, tbl, tmp_path):
    t, docs = tbl
    t.set_constraint("chars_positive", "n_chars > 0")
    assert t.constraints() == {"chars_positive": "n_chars > 0"}
    # a violating append refuses BEFORE any file lands
    head = t.current_version()
    bad = spark.createDataFrame(
        [Row(doc_id=900001, lang="aa", n_chars=0)],
        "doc_id long, lang string, n_chars long")
    with pytest.raises(ConstraintViolationError, match="chars_positive"):
        t.commit(bad, "append")
    assert t.current_version() == head
    # a clean append passes, and the property carries forward
    t.commit(bad.withColumn("n_chars", F.lit(5).cast("long")), "append")
    assert t.constraints() == {"chars_positive": "n_chars > 0"}
    # adding a constraint the EXISTING data violates refuses
    with pytest.raises(ConstraintViolationError, match="existing rows"):
        t.set_constraint("impossible", "n_chars > 1000000")


def test_null_passes_check_semantics(spark, tmp_path):
    """SQL CHECK: NULL predicate result is not a violation — the
    opposite of commit_expect's expectations (documented contrast)."""
    t = LakeTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame(
        [Row(doc_id=1, n_chars=10)], "doc_id long, n_chars long"))
    t.set_constraint("cap", "n_chars < 100")
    t.commit(spark.createDataFrame(
        [Row(doc_id=2, n_chars=None)], "doc_id long, n_chars long"),
        "append")                              # NULL passes
    assert t.read().count() == 2
    with pytest.raises(ConstraintViolationError):
        t.commit(spark.createDataFrame(
            [Row(doc_id=3, n_chars=500)], "doc_id long, n_chars long"),
            "append")


def test_update_and_merge_cannot_bypass(spark, tbl):
    t, docs = tbl
    t.set_constraint("chars_positive", "n_chars > 0")
    head = t.current_version()
    with pytest.raises(ConstraintViolationError, match="update"):
        t.update({"doc_id": (0, 10)}, {"n_chars": F.lit(-1)})
    assert t.current_version() == head
    bad = spark.createDataFrame(
        [Row(doc_id=0, lang="aa", n_chars=-9)],
        "doc_id long, lang string, n_chars long")
    with pytest.raises(ConstraintViolationError, match="merge"):
        t.merge(bad, "doc_id")
    assert t.current_version() == head
    # clean update/merge pass
    t.update({"doc_id": (0, 10)}, {"n_chars": F.lit(3)})
    t.merge(bad.withColumn("n_chars", F.lit(4)), "doc_id")
    assert t.read().where(F.col("n_chars") <= 0).count() == 0


def test_drop_and_unknown_name(spark, tbl):
    t, docs = tbl
    t.set_constraint("cap", "n_chars < 1000000")
    t.drop_constraint("cap")
    assert t.constraints() == {}
    t.commit(spark.createDataFrame(
        [Row(doc_id=900009, lang="aa", n_chars=2000000)],
        "doc_id long, lang string, n_chars long"), "append")
    with pytest.raises(ValueError, match="no constraint named"):
        t.drop_constraint("never_was")


def test_property_survives_compact_restore_clone(spark, tbl, tmp_path):
    t, docs = tbl
    t.set_constraint("chars_positive", "n_chars > 0")
    t.commit(docs.limit(100), "append")
    t.compact(target_bytes=1 << 30)
    assert t.constraints() == {"chars_positive": "n_chars > 0"}
    t.restore(t.current_version() - 1)
    assert t.constraints() == {"chars_positive": "n_chars > 0"}
    c = t.clone(str(tmp_path / "dev"), pin_tag=False)
    assert c.constraints() == {"chars_positive": "n_chars > 0"}
    bad = spark.createDataFrame(
        [Row(doc_id=1, lang="aa", n_chars=-1)],
        "doc_id long, lang string, n_chars long")
    with pytest.raises(ConstraintViolationError):
        c.commit(bad, "append")
    # exactly-once: replaying a set_constraint txn is a no-op
    v = t.set_constraint("cap", "n_chars < 10000000", txn_id="sc-1")
    assert t.set_constraint("cap", "n_chars < 10000000",
                            txn_id="sc-1") == v


def test_transient_carry_forward_read_error_fails_loudly(spark, tbl,
                                                         monkeypatch):
    """_publish carries standing constraints forward by re-reading the
    prior entry; a TRANSIENT backend error on that read used to be
    swallowed (bare except → constraints=None), silently disabling
    enforcement for this and every future version. It must propagate —
    a commit that cannot see the table's constraints must not publish."""
    t, docs = tbl
    t.set_constraint("cap", "n_chars < 1000000000")
    head = t.current_version()

    def boom(path):
        raise ConnectionError("transient backend read failure")

    monkeypatch.setattr(t.backend, "get", boom)
    with pytest.raises(ConnectionError):
        t._publish([], "append", None, head + 1)
    monkeypatch.undo()
    # nothing published, the constraint still stands and still gates
    assert t.current_version() == head
    assert t.constraints() == {"cap": "n_chars < 1000000000"}
    with pytest.raises(ConstraintViolationError):
        t.commit(spark.createDataFrame(
            [Row(doc_id=1, lang="aa", n_chars=2000000000)],
            "doc_id long, lang string, n_chars long"), "append")


def test_append_retry_revalidates_competitor_constraint(spark, tmp_path,
                                                        monkeypatch):
    """An append that loses the version race re-publishes against the
    NEW head. If the competitor's commit added a CHECK constraint, the
    retried batch was never gated on it — it must be re-validated, or
    the new version records a constraint its own rows violate (the r10
    advice find). The loser's already-written data files are reclaimed
    when the re-gate refuses."""
    t = LakeTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame(
        [Row(doc_id=1, n_chars=10), Row(doc_id=2, n_chars=20)],
        "doc_id long, n_chars long"))
    t2 = LakeTable(spark, str(tmp_path / "t"))   # competitor handle
    real_put = t.backend.put_if_absent
    state = {"raced": False}

    def racing_put(path, body):
        if not state["raced"]:
            state["raced"] = True
            # competitor wins the version race AND adds a constraint
            # the loser's batch violates
            t2.set_constraint("pos", "n_chars > 0")
        return real_put(path, body)

    monkeypatch.setattr(t.backend, "put_if_absent", racing_put)
    bad = spark.createDataFrame([Row(doc_id=3, n_chars=0)],
                                "doc_id long, n_chars long")
    with pytest.raises(ConstraintViolationError, match="pos"):
        t.commit(bad, "append", retries=3)
    monkeypatch.undo()
    # competitor's constraint commit is the head; the bad row never landed
    assert t2.constraints() == {"pos": "n_chars > 0"}
    assert t.read().where(F.col("n_chars") <= 0).count() == 0
    # the loser's orphan data files were reclaimed
    live = set(t._read_entry(t.current_version())["files"])
    on_disk = set(t.data_plane.walk(str(tmp_path / "t" / "data")))
    assert on_disk == live


def test_table_properties_and_commit_meta(spark, tbl, tmp_path):
    """op 19 parity surface: TABLE PROPERTIES carry forward through
    data writes / compact / restore and copy into clones (Delta
    TBLPROPERTIES), per-commit `meta` records the reference's
    record_count/source/extracted_date per object batch
    (ref lambda_function.py:332-337), and lake_sink wires both."""
    from aws_data_pipeline_ads_spark.pipeline.sink import lake_sink

    t, docs = tbl
    t.set_property("pipeline.source", "marketing")
    t.set_property("pipeline.retention_days", 30)
    assert t.table_properties() == {"pipeline.source": "marketing",
                                    "pipeline.retention_days": 30}
    # carried by data commits, survives compact and restore
    t.commit(docs.limit(20), "append",
             meta={"source": "marketing", "extracted_date": "2026-08-16"})
    t.compact(target_bytes=1 << 30)
    assert t.table_properties()["pipeline.source"] == "marketing"
    t.restore(t.current_version() - 1)
    assert t.table_properties()["pipeline.retention_days"] == 30
    # clone copies them
    c = t.clone(str(tmp_path / "dev"), pin_tag=False)
    assert c.table_properties() == t.table_properties()
    # the data commit's meta is in history with the auto record_count
    metas = [h["meta"] for h in t.history() if "meta" in h]
    assert {"source": "marketing", "extracted_date": "2026-08-16",
            "record_count": 20} in metas
    # drop removes; unknown name refuses; replay is exactly-once
    t.drop_property("pipeline.retention_days")
    assert t.table_properties() == {"pipeline.source": "marketing"}
    with pytest.raises(ValueError, match="no property"):
        t.drop_property("never_was")
    v = t.set_property("pipeline.owner", "ads", txn_id="sp-1")
    assert t.set_property("pipeline.owner", "ads", txn_id="sp-1") == v
    with pytest.raises(ValueError, match="JSON-native"):
        t.set_property("bad", object())

    # lake_sink: one call lands the batch + meta + both properties
    t2 = LakeTable(spark, str(tmp_path / "sinktbl"))
    t2.commit(docs.limit(0))
    lake_sink(docs.limit(7), t2, "sales", "2026-08-16", txn_id="run-1")
    assert t2.table_properties() == {"pipeline.source": "sales",
                                     "pipeline.last_date": "2026-08-16"}
    m = [h["meta"] for h in t2.history() if "meta" in h][-1]
    assert m == {"source": "sales", "extracted_date": "2026-08-16",
                 "record_count": 7}
    # a second run same-date run is meta-only on the property side
    # (no redundant property commits) and lands its own batch meta
    head = t2.current_version()
    lake_sink(docs.limit(3), t2, "sales", "2026-08-16", txn_id="run-2")
    assert t2.current_version() == head + 1   # just the data commit
    assert t2.read().count() == 10


def test_streaming_append_respects_constraints(spark, sf_dir, tmp_path):
    """The streaming append sink rides commit(), so a standing CHECK
    constraint poisons a violating micro-batch loudly — bad rows never
    land through the streaming path either."""
    from aws_data_pipeline_ads_spark import streaming
    from aws_data_pipeline_ads_spark.lakelog import lake_append_sink

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text").limit(30)
    t = LakeTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame([Row(doc_id=-1, text="ok")],
                                   "doc_id long, text string"))
    t.set_constraint("text_short", "length(text) < 5")
    land = tmp_path / "landing"
    docs.coalesce(1).write.parquet(str(land / "s1"))
    stream = streaming.documents_stream(spark, str(land))
    with pytest.raises(Exception, match="text_short"):
        lake_append_sink(stream, t, str(tmp_path / "ck"))
    assert t.read().count() == 1               # nothing bad landed


def test_set_properties_combined_commit_noop_and_retry(spark, tbl):
    """set_properties lands N properties in ONE metadata commit,
    no-ops (zero commits) when every key is already current, and
    retries a lost head race by re-reading the head — a concurrent
    multi-source lake_sink neither thrashes versions nor drops an
    update."""
    from aws_data_pipeline_ads_spark.lakelog import ConcurrentWriteError

    t, docs = tbl
    v0 = t.current_version()
    v1 = t.set_properties({"pipeline.source": "m",
                           "pipeline.last_date": "2026-08-16"})
    assert v1 == v0 + 1                       # ONE commit for both
    assert t.table_properties() == {"pipeline.source": "m",
                                    "pipeline.last_date": "2026-08-16"}
    # no-op: already current → no new version published
    assert t.set_properties({"pipeline.source": "m"}) == v1
    assert t.current_version() == v1
    # lost race retried: first publish attempt is beaten by a
    # competitor commit that lands mid-flight
    real_put = t.backend.put_if_absent
    state = {"raced": False}

    def racy_put(path, s):
        if not state["raced"]:
            state["raced"] = True
            t.commit(docs.limit(1), "append")  # competitor wins v+1
            return False
        return real_put(path, s)

    t.backend.put_if_absent = racy_put
    try:
        v2 = t.set_properties({"pipeline.last_date": "2026-08-17"})
    finally:
        t.backend.put_if_absent = real_put
    assert t.table_properties()["pipeline.last_date"] == "2026-08-17"
    # the competitor's data row survived alongside the property update
    assert t.current_version() == v2
    with pytest.raises(ConcurrentWriteError):
        t.backend.put_if_absent = lambda p, s: False
        try:
            t.set_properties({"x": "y"}, retries=1)
        finally:
            t.backend.put_if_absent = real_put
    with pytest.raises(ValueError, match="empty"):
        t.set_properties({})
