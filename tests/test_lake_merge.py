"""merge_clauses: full Delta-style MERGE (WHEN MATCHED [AND cond]
UPDATE/DELETE, WHEN NOT MATCHED INSERT) in one cover-scoped commit, and
feed_changes_cdc: Delta-CDF-style _change_type classification over the
per-consumer change feed.
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


def _rows(df):
    # None-safe sort (replication rows may carry NULL keys)
    return sorted((tuple(r) for r in df.collect()),
                  key=lambda t: tuple((v is None, v) for v in t))


@pytest.fixture
def tbl(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    base = orders.filter(F.col("o_orderkey") <= 2000)
    t = LakeTable(spark, str(tmp_path / "t"))
    t.commit(base.repartitionByRange(8, "o_orderkey"),
             bloom_cols=["o_orderkey"])
    return t, base


def test_merge_clauses_three_way(spark, tbl):
    """UPDATE + DELETE + INSERT in one commit equals the flat
    recompute; delete wins over update; SET sees src_ columns; the
    rewrite is cover-scoped (most files shared)."""
    t, base = tbl
    upd = base.filter(F.col("o_orderkey") % 10 == 3).select(
        "o_orderkey", "o_custkey",
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 20 == 3, F.lit("del"))
        .otherwise(F.lit("upd")).alias("action"))
    ins = base.filter(F.col("o_orderkey") % 10 == 7).select(
        (F.col("o_orderkey") + 3_000_000).alias("o_orderkey"),
        "o_custkey", "o_totalprice", F.lit("ins").alias("action"))
    before = set(t._read_entry(t.current_version())["files"])
    v = t.merge_clauses(
        upd.unionByName(ins), "o_orderkey",
        matched_update={"o_totalprice": "src_o_totalprice"},
        matched_delete="src_action = 'del'", txn_id="mc-1")
    exp = base.where(F.col("o_orderkey") % 20 != 3).select(
        "o_orderkey", "o_custkey",
        F.when(F.col("o_orderkey") % 10 == 3,
               F.col("o_totalprice") * 2)
        .otherwise(F.col("o_totalprice")).alias("o_totalprice")
    ).unionByName(ins.drop("action"))
    assert _rows(t.read()) == _rows(exp)
    # replay is exactly-once
    assert t.merge_clauses(upd.unionByName(ins), "o_orderkey",
                           matched_update={"o_totalprice":
                                           "src_o_totalprice"},
                           matched_delete="src_action = 'del'",
                           txn_id="mc-1") == v


def test_merge_clauses_cover_scoped_rewrite(spark, tbl):
    """A narrow-key merge on a key-clustered, bloom-indexed table must
    share most files byte-for-byte — delete_keys' bounded-rewrite
    shape generalized to MERGE."""
    t, base = tbl
    keys = [r[0] for r in base.select("o_orderkey")
            .orderBy("o_orderkey").limit(3).collect()]
    src = spark.createDataFrame(
        [Row(o_orderkey=k, o_custkey=1, o_totalprice=9.5)
         for k in keys]
        + [Row(o_orderkey=7_000_001, o_custkey=2, o_totalprice=1.0)],
        "o_orderkey long, o_custkey long, o_totalprice double")
    before = set(t._read_entry(t.current_version())["files"])
    t.merge_clauses(src, "o_orderkey",
                    matched_update={"o_totalprice": "src_o_totalprice"})
    after = set(t._read_entry(t.current_version())["files"])
    assert len(before & after) >= len(before) - 2   # bounded rewrite
    got = {r["o_orderkey"]: r["o_totalprice"] for r in
           t.read().where(F.col("o_orderkey").isin(
               keys + [7_000_001])).collect()}
    assert all(got[k] == 9.5 for k in keys)
    assert got[7_000_001] == 1.0


def test_merge_clauses_guards(spark, tbl):
    t, base = tbl
    dup = spark.createDataFrame(
        [Row(o_orderkey=1, o_custkey=1, o_totalprice=1.0)] * 2,
        "o_orderkey long, o_custkey long, o_totalprice double")
    with pytest.raises(ValueError, match="duplicate key"):
        t.merge_clauses(dup, "o_orderkey",
                        matched_update={"o_totalprice": "1.0"})
    with pytest.raises(ValueError, match="unknown target column"):
        t.merge_clauses(dup.limit(1), "o_orderkey",
                        matched_update={"nope": "1.0"})
    with pytest.raises(ValueError, match="at least one clause"):
        t.merge_clauses(dup.limit(1), "o_orderkey", insert=False)


def test_merge_clauses_respects_constraints(spark, tbl):
    """Updated projections AND inserts are gated BEFORE any file
    lands; a refused merge leaves the head untouched and no orphans."""
    t, base = tbl
    t.set_constraint("pos", "o_totalprice > 0")
    head = t.current_version()
    files_before = set(t.data_plane.walk(f"{t.path}/data"))
    bad_ins = spark.createDataFrame(
        [Row(o_orderkey=8_000_001, o_custkey=1, o_totalprice=-5.0)],
        "o_orderkey long, o_custkey long, o_totalprice double")
    with pytest.raises(ConstraintViolationError, match="pos"):
        t.merge_clauses(bad_ins, "o_orderkey")
    k = base.select("o_orderkey").orderBy("o_orderkey").first()[0]
    bad_upd = spark.createDataFrame(
        [Row(o_orderkey=k, o_custkey=1, o_totalprice=-1.0)],
        "o_orderkey long, o_custkey long, o_totalprice double")
    with pytest.raises(ConstraintViolationError, match="pos"):
        t.merge_clauses(bad_upd, "o_orderkey",
                        matched_update={"o_totalprice":
                                        "src_o_totalprice"},
                        insert=False)
    assert t.current_version() == head
    assert set(t.data_plane.walk(f"{t.path}/data")) == files_before


def test_merge_clauses_first_commit_and_delete_only(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    src = spark.createDataFrame(
        [Row(k=1, v=10), Row(k=2, v=20)], "k long, v long")
    t.merge_clauses(src, "k")                   # empty table: insert all
    assert t.read().count() == 2
    # delete-only merge: matched rows vanish, nothing inserted
    t.merge_clauses(
        spark.createDataFrame([Row(k=1, v=0)], "k long, v long"),
        "k", matched_delete="true", insert=False)
    assert [r["k"] for r in t.read().collect()] == [2]


def test_replicate_to_converges_under_revisions(spark, sf_dir,
                                                tmp_path):
    """The CDC replication loop (feed_changes_cdc → merge_clauses):
    after EVERY replicate_to call the replica equals the source head,
    through appends, CoW updates, deletes, NULL-keyed inserts,
    no-op revisions, and a crash between apply and ack (replay must
    not double-apply)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    src = LakeTable(spark, str(tmp_path / "src"))
    rep = LakeTable(spark, str(tmp_path / "rep"))
    src.commit(docs.filter(F.col("doc_id") % 3 == 0)
               .repartitionByRange(4, "doc_id"))
    assert src.replicate_to(rep, "dr", "doc_id") == 0
    assert _rows(rep.read()) == _rows(src.read())
    assert src.replicate_to(rep, "dr", "doc_id") is None  # current

    src.commit(docs.filter(F.col("doc_id") % 3 == 1), "append")
    src.update({"doc_id": (10, 49)}, {"n_chars": F.lit(5)})
    src.delete({"doc_id": (100, 199)})
    src.commit(spark.createDataFrame(
        [Row(doc_id=None, lang="zz", n_chars=1)],
        "doc_id long, lang string, n_chars long"), "append")
    src.replicate_to(rep, "dr", "doc_id")
    assert _rows(rep.read()) == _rows(src.read())

    # crash between apply and ack: simulate by re-winding the offset
    head = src.current_version()
    src.commit(docs.filter(F.col("doc_id") % 3 == 2).limit(50),
               "append")
    rep_v = None
    real_ack = src.ack_feed

    def no_ack(consumer, version):  # crash before ack
        pass

    src.ack_feed = no_ack
    try:
        rep_v = src.replicate_to(rep, "dr", "doc_id")
    finally:
        src.ack_feed = real_ack
    # redelivery: the target answers the replay from its txn log
    assert src.replicate_to(rep, "dr", "doc_id") == rep_v
    assert rep.table_properties() == src.table_properties()
    assert _rows(rep.read()) == _rows(src.read())
    # a NULL-keyed DELETE refuses loudly
    src.delete({"n_chars": (1, 1)})        # removes the NULL-key row
    with pytest.raises(ValueError, match="NULL-keyed DELETE"):
        src.replicate_to(rep, "dr", "doc_id")


def test_feed_changes_cdc_classification(spark, tmp_path):
    """insert / delete / update pre+post pairs, no-op-update and
    intra-span appear+disappear cancellation, NULL-key handling."""
    t = LakeTable(spark, str(tmp_path / "t"))
    rows = [Row(k=1, v=10), Row(k=2, v=20), Row(k=3, v=7),
            Row(k=None, v=99)]
    t.commit(spark.createDataFrame(rows, "k long, v long"))
    first, h0 = t.feed_changes_cdc("c", "k")
    assert {r["_change_type"] for r in first.collect()} == {"insert"}
    assert first.count() == 4                   # initial load, NULL too
    t.ack_feed("c", h0)
    # revisions: update k=1 (real), "update" k=3 to its own value
    # (no-op), delete k=2, append k=4 and a NULL-keyed row, and an
    # intra-span appear+disappear (k=5)
    t.update({"k": (1, 1)}, {"v": F.lit(11)})
    t.update({"k": (3, 3)}, {"v": F.lit(7)})
    t.delete({"k": (2, 2)})
    t.commit(spark.createDataFrame(
        [Row(k=4, v=40), Row(k=None, v=77), Row(k=5, v=50)],
        "k long, v long"), "append")
    t.delete({"k": (5, 5)})
    cdc, head = t.feed_changes_cdc("c", "k")
    skey = lambda t: ((t[0] is None, t[0]) if t[0] is not None
                      else (True, -1), t[1], t[2])
    got = sorted(((r["k"], r["v"], r["_change_type"])
                  for r in cdc.collect()), key=skey)
    assert got == [
        (1, 10, "update_preimage"),
        (1, 11, "update_postimage"),
        (2, 20, "delete"),
        (4, 40, "insert"),
        (None, 77, "insert"),                  # NULL key: net appear
    ]
    # at-least-once: same delta until ack; nothing after ack
    again, _ = t.feed_changes_cdc("c", "k")
    assert sorted(((r["k"], r["v"], r["_change_type"])
                   for r in again.collect()), key=skey) == got
    t.ack_feed("c", head)
    none, _ = t.feed_changes_cdc("c", "k")
    assert none is None


def test_merge_clauses_lost_race_discards_files(spark, tbl):
    """A concurrent commit landing between head-resolve and publish
    raises ConcurrentWriteError — and the freshly written kept+insert
    files are DISCARDED (no entry will ever reference them, so vacuum
    could never reclaim the orphans)."""
    from aws_data_pipeline_ads_spark.lakelog import ConcurrentWriteError

    t, base = tbl
    files_before = set(t.data_plane.walk(f"{t.path}/data"))
    head = t.current_version()
    real_put = t.backend.put_if_absent
    t.backend.put_if_absent = lambda p, s: False  # lose every race
    try:
        with pytest.raises(ConcurrentWriteError):
            t.merge_clauses(
                spark.createDataFrame(
                    [Row(o_orderkey=1, o_custkey=1, o_totalprice=9.9)],
                    "o_orderkey long, o_custkey long, "
                    "o_totalprice double"),
                "o_orderkey",
                matched_update={"o_totalprice": "src_o_totalprice"})
    finally:
        t.backend.put_if_absent = real_put
    assert t.current_version() == head
    assert set(t.data_plane.walk(f"{t.path}/data")) == files_before


def test_merge_clauses_internal_name_collision_refuses(spark, tmp_path):
    """A target column occupying the join frame's src_<col>/__m
    internal names refuses with the column named, instead of an
    opaque ambiguous-reference AnalysisException downstream."""
    t = LakeTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame(
        [Row(k=1, src_v=10, v=1)], "k long, src_v long, v long"))
    src = spark.createDataFrame([Row(k=1, v=2)], "k long, v long")
    with pytest.raises(ValueError, match="src_v"):
        t.merge_clauses(src, "k", matched_update={"v": "src_v"})
    t2 = LakeTable(spark, str(tmp_path / "t2"))
    t2.commit(spark.createDataFrame(
        [Row(k=1, __m=0)], "k long, __m long"))
    with pytest.raises(ValueError, match="__m"):
        t2.merge_clauses(
            spark.createDataFrame([Row(k=1, __m=1)], "k long, __m long"),
            "k", matched_update={"__m": "src___m"})


def test_replicate_to_refuses_prepopulated_target(spark, tmp_path):
    """The replica is OWNED by the replication loop: an initial sync
    into a table that already holds foreign rows refuses loudly
    (those rows would silently survive every sync); an empty-but-
    committed target is fine."""
    src = LakeTable(spark, str(tmp_path / "src"))
    src.commit(spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b")], "k long, v string"))
    rep = LakeTable(spark, str(tmp_path / "rep"))
    rep.commit(spark.createDataFrame(
        [Row(k=99, v="foreign")], "k long, v string"))
    with pytest.raises(ValueError, match="pre-populated"):
        src.replicate_to(rep, "dr", "k")
    # an empty committed target is legal (the loop owns it)
    rep2 = LakeTable(spark, str(tmp_path / "rep2"))
    rep2.commit(spark.createDataFrame([], "k long, v string"))
    assert src.replicate_to(rep2, "dr2", "k") is not None
    assert _rows(rep2.read()) == _rows(src.read())


def test_merge_clauses_schema_evolution(spark, tmp_path):
    """merge_clauses(evolve=True) — Delta withSchemaEvolution()
    parity: an INSERT/UPDATE-bearing merge adds NEW source columns as
    nullable fields; untouched files and non-matched kept rows read
    them as NULL; prior versions time-travel with their own schemas;
    without evolve the unknown column refuses with a pointer; shared-
    column type drift always refuses."""
    from aws_data_pipeline_ads_spark.lakelog import SchemaMismatchError

    t = LakeTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")],
        "k long, v string").repartition(2))
    v0 = t.current_version()
    src = spark.createDataFrame(
        [Row(k=2, v="B", score=0.5), Row(k=9, v="i", score=0.9)],
        "k long, v string, score double")
    # without evolve: refuse, naming the fix
    with pytest.raises(ValueError, match="evolve=True"):
        t.merge_clauses(src, "k",
                        matched_update={"v": "src_v",
                                        "score": "src_score"})
    v1 = t.merge_clauses(src, "k",
                         matched_update={"v": "src_v",
                                         "score": "src_score"},
                         evolve=True)
    got = _rows(t.read().select("k", "v", "score"))
    assert got == [(1, "a", None), (2, "B", 0.5),
                   (3, "c", None), (9, "i", 0.9)]
    # prior version time-travels with ITS schema (no score column)
    assert t.read(v0).columns == ["k", "v"]
    assert "score" in t.read(v1).columns
    # a second evolve merge into the widened table works plainly
    t.merge_clauses(spark.createDataFrame(
        [Row(k=1, v="A", score=1.0)],
        "k long, v string, score double"), "k",
        matched_update={"score": "src_score"}, evolve=True)
    assert _rows(t.read().where("k = 1")) == [(1, "a", 1.0)]
    # matched_update listing the new column but source NOT matched →
    # inserts carry it from source (covered above by k=9); type drift
    # on a shared column refuses even with evolve
    bad = spark.createDataFrame([Row(k=1, v=5)], "k long, v long")
    with pytest.raises(SchemaMismatchError, match="types"):
        t.merge_clauses(bad, "k", matched_update={"v": "src_v"},
                        evolve=True)
    # evolve INSERT-only path: unmatched rows land with the new col,
    # kept rows get NULL
    t2 = LakeTable(spark, str(tmp_path / "t2"))
    t2.commit(spark.createDataFrame([Row(k=1, v="x")],
                                    "k long, v string"))
    t2.merge_clauses(spark.createDataFrame(
        [Row(k=7, v="y", extra=3)], "k long, v string, extra long"),
        "k", evolve=True)
    assert _rows(t2.read()) == [(1, "x", None), (7, "y", 3)]


def test_lake_cdc_sink_streaming_replication(spark, sf_dir, tmp_path):
    """lake_cdc_sink: a drained availableNow stream leaves the replica
    equal to the source's final state; out-of-band source commits
    (CoW update + delete between drains) ride the feed into the next
    sync; a checkpoint replay commits nothing new on either table."""
    from aws_data_pipeline_ads_spark import streaming
    from aws_data_pipeline_ads_spark.lakelog import lake_cdc_sink

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars").where(F.col("doc_id") < 400)
    land = tmp_path / "landing"
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        str(land / "s1"))
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        str(land / "s2"))
    src = LakeTable(spark, str(tmp_path / "src"))
    rep = LakeTable(spark, str(tmp_path / "rep"))
    ck = str(tmp_path / "ck")
    stream = streaming.documents_stream(spark, str(land),
                                        max_files_per_trigger=1)
    lake_cdc_sink(stream, src, rep, ck, "dr", "doc_id")
    assert _rows(rep.read()) == _rows(src.read())
    assert rep.read().count() == docs.count()

    # out-of-band source revisions between drains + one more shard
    src.update({"doc_id": (10, 49)}, {"n_chars": F.lit(9)})
    src.delete({"doc_id": (100, 149)})
    docs.where(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "lang",
        "n_chars").coalesce(1).write.parquet(str(land / "s3"))
    stream = streaming.documents_stream(spark, str(land),
                                        max_files_per_trigger=1)
    lake_cdc_sink(stream, src, rep, ck, "dr", "doc_id")
    assert _rows(rep.read()) == _rows(src.read())

    # replay over the same checkpoint: nothing new anywhere
    vs, vr = src.current_version(), rep.current_version()
    stream = streaming.documents_stream(spark, str(land),
                                        max_files_per_trigger=1)
    lake_cdc_sink(stream, src, rep, ck, "dr", "doc_id")
    assert (src.current_version(), rep.current_version()) == (vs, vr)


def test_lake_cdc_sink_crash_between_apply_and_ack(spark, sf_dir,
                                                   tmp_path):
    """A crash after the replica's merge commit but before the feed
    ack redelivers the delta; the next drain converges without
    double-applying (same-head replay answers from the replica's txn
    log, a grown delta re-applies idempotently)."""
    from aws_data_pipeline_ads_spark import streaming
    from aws_data_pipeline_ads_spark.lakelog import lake_cdc_sink

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars").where(F.col("doc_id") < 200)
    land = tmp_path / "landing"
    docs.coalesce(1).write.parquet(str(land / "s1"))
    src = LakeTable(spark, str(tmp_path / "src"))
    rep = LakeTable(spark, str(tmp_path / "rep"))
    ck = str(tmp_path / "ck")

    real_ack = src.ack_feed
    src.ack_feed = lambda consumer, version: None  # crash before ack
    try:
        stream = streaming.documents_stream(spark, str(land))
        lake_cdc_sink(stream, src, rep, ck, "dr", "doc_id")
    finally:
        src.ack_feed = real_ack
    assert _rows(rep.read()) == _rows(src.read())
    rep_v = rep.current_version()

    # same-head redelivery: replicate answers from the txn log (no
    # new replica version), then acks
    assert src.replicate_to(rep, "dr", "doc_id") == rep_v
    assert rep.current_version() == rep_v
    assert src.replicate_to(rep, "dr", "doc_id") is None  # acked now

    # grown-delta redelivery: crash again, then more changes land
    src.ack_feed = lambda consumer, version: None
    try:
        src.update({"doc_id": (0, 20)}, {"n_chars": F.lit(3)})
        src.replicate_to(rep, "dr", "doc_id")   # applies, no ack
    finally:
        src.ack_feed = real_ack
    src.delete({"doc_id": (50, 80)})
    docs.select((F.col("doc_id") + 5_000).alias("doc_id"), "lang",
                "n_chars").limit(10).coalesce(1).write.parquet(
        str(land / "s2"))
    stream = streaming.documents_stream(spark, str(land))
    lake_cdc_sink(stream, src, rep, ck, "dr", "doc_id")
    assert _rows(rep.read()) == _rows(src.read())


@pytest.mark.parametrize("backend_kind", ["posix", "condput"])
def test_replicate_to_under_concurrent_source_commits(
        spark, tmp_path, backend_kind, monkeypatch):
    """Randomized interleaving of source writers with replication
    syncs, on both commit backends, including the critical race: a
    competitor commit landing on the SOURCE while replicate_to is
    mid-sync (after the feed head resolved, before the target commit
    publishes). Invariant: after every sync that consumed head H the
    replica equals source-AT-H — never a torn state mixing H and the
    mid-sync commit — and the final drain converges to the source's
    final state."""
    import random

    from aws_data_pipeline_ads_spark.lakelog import (
        ConditionalPutCommitBackend,
    )

    rng = random.Random(1207)
    if backend_kind == "condput":
        shared = ConditionalPutCommitBackend()
        mk = lambda: shared                    # noqa: E731
        rep_backend = ConditionalPutCommitBackend()
        mk_rep = lambda: rep_backend           # noqa: E731
    else:
        mk = lambda: None                      # noqa: E731
        mk_rep = lambda: None                  # noqa: E731

    src_path = str(tmp_path / "src")
    t1 = LakeTable(spark, src_path, backend=mk())
    t2 = LakeTable(spark, src_path, backend=mk())
    rep = LakeTable(spark, str(tmp_path / "rep"), backend=mk_rep())

    next_id = [0]

    def batch(n):
        rows = [Row(doc_id=next_id[0] + i,
                    lang=("aa", "bb", "cc")[(next_id[0] + i) % 3],
                    n_chars=(next_id[0] + i) % 37) for i in range(n)]
        next_id[0] += n
        return spark.createDataFrame(
            rows, "doc_id long, lang string, n_chars long")

    t1.commit(batch(8))

    # mid-sync competitor: while replicate_to publishes to the
    # TARGET, a source commit sneaks in (the feed span advances
    # under the sync's feet); reentrancy-guarded like the MV stress
    state = {"sneak": False, "busy": False, "fired": 0}
    real_put = rep.backend.put_if_absent

    def mid_sync_put(path, data):
        if state["sneak"] and not state["busy"]:
            state["sneak"] = False
            state["busy"] = True
            try:
                t2.commit(batch(rng.randint(1, 3)), "append",
                          retries=3)
                state["fired"] += 1
            finally:
                state["busy"] = False
        return real_put(path, data)

    monkeypatch.setattr(rep.backend, "put_if_absent", mid_sync_put)
    for step in range(12):
        op = rng.choice(["a", "u", "d", "r", "r"])
        if op == "a":
            t1.commit(batch(rng.randint(1, 4)), "append", retries=3)
        elif op == "u":
            lo = rng.randrange(max(next_id[0], 1))
            t1.update({"doc_id": (lo, lo + 5)},
                      {"n_chars": F.lit(step)})
        elif op == "d":
            lo = rng.randrange(max(next_id[0], 1))
            t1.delete({"doc_id": (lo, lo + 2)})
        else:
            state["sneak"] = rng.random() < 0.7
            applied = t1.replicate_to(rep, "dr", "doc_id")
            state["sneak"] = False
            if applied is not None:
                # replica == source AT the acked head (the feed
                # offset tag), never torn — a mid-sync source commit
                # must NOT leak into this sync
                acked_head = t1.tags()["feed-dr"]
                assert _rows(rep.read()) == _rows(t1.read(acked_head))
    monkeypatch.undo()
    assert state["fired"] >= 1      # the mid-sync race really fired
    # final drain converges on the source's final state
    for _ in range(10):
        if t1.replicate_to(rep, "dr", "doc_id") is None:
            break
    assert _rows(rep.read()) == _rows(t1.read())
