"""Merge-on-read UPDATE (aws_data_pipeline_ads_spark/lakelog.py
update(defer=True)): one commit hides the old images behind a scoped
deferred-delete predicate and appends ONLY the post-image rows —
O(changed rows) written instead of O(covered files) rewritten."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row, functions as F

from aws_data_pipeline_ads_spark.lakelog import (
    ConditionalPutCommitBackend,
    ConstraintViolationError,
    LakeTable,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(params=["posix", "condput"])
def mk_table(request, spark):
    if request.param == "posix":
        return lambda path: LakeTable(spark, path)
    stores: dict[str, ConditionalPutCommitBackend] = {}

    def make(path: str) -> LakeTable:
        backend = stores.setdefault(path, ConditionalPutCommitBackend())
        return LakeTable(spark, path, backend=backend)

    return make


def _entry(t: LakeTable, version: int) -> dict:
    return json.loads(t.backend.get(t._entry_path(version)))


def _mk(spark, mk_table, path, n=1000, files=8):
    t = mk_table(path)
    t.commit(spark.createDataFrame(
        [Row(k=i, v=float(i)) for i in range(n)], "k long, v double")
        .repartitionByRange(files, "k"), "overwrite")
    return t


def test_defer_update_is_o_changed_rows(spark, tmp_path, mk_table):
    """all prior files shared; the new files hold EXACTLY the matched
    rows' post-images; reads see them immediately."""
    t = _mk(spark, mk_table, str(tmp_path / "tbl"))
    before = list(_entry(t, 0)["files"])
    t.update({"k": (100, 109)}, {"v": "v + 10000"}, defer=True)
    e = _entry(t, 1)
    assert set(before) <= set(e["files"])  # every prior file shared
    new_files = [f for f in e["files"] if f not in before]
    assert new_files
    new_rows = sum(e["row_counts"][f] for f in new_files)
    assert new_rows == 10  # exactly the changed rows
    got = {r.k: r.v for r in t.read().collect()}
    assert len(got) == 1000
    assert got[105] == 10105.0 and got[99] == 99.0
    # time travel: pre-image intact
    old = {r.k: r.v for r in t.read(0).collect()}
    assert old[105] == 105.0


def test_defer_update_then_append_not_hidden(spark, tmp_path, mk_table):
    """rows appended AFTER the deferred update match the predicate but
    post-date its snapshot scope — they must stay visible."""
    t = _mk(spark, mk_table, str(tmp_path / "tbl"), n=50)
    t.update({"k": (0, 9)}, {"v": "v * 0 - 1"}, defer=True)
    t.commit(spark.createDataFrame([Row(k=5, v=555.0)],
                                   "k long, v double"), "append")
    got = sorted((r.k, r.v) for r in t.read()
                 .filter(F.col("k") == 5).collect())
    assert got == [(5, -1.0), (5, 555.0)]  # post-image AND new append


def test_defer_update_stacks_and_compacts(spark, tmp_path, mk_table):
    t = _mk(spark, mk_table, str(tmp_path / "tbl"), n=100)
    t.update({"k": (0, 4)}, {"v": "v + 1000"}, defer=True)
    t.update({"k": (3, 6)}, {"v": "v + 100000"}, defer=True)
    got = {r.k: r.v for r in t.read().collect()}
    assert len(got) == 100
    # k=3: first update made it 1003, second hides BOTH images of k=3
    # in pre-second files (original + first post-image) and writes
    # post-images of every visible match — 1003 + 100000
    assert got[3] == 101003.0
    assert got[0] == 1000.0 and got[6] == 100006.0 and got[7] == 7.0
    with pytest.raises(ValueError, match="deferred"):
        t.stats()
    t.compact(target_bytes=1 << 30)
    assert {r.k: r.v for r in t.read().collect()} == got
    assert t.stats()["rows"] == 100


def test_defer_update_gates_and_bounds(spark, tmp_path, mk_table):
    t = _mk(spark, mk_table, str(tmp_path / "tbl"), n=20)
    t.set_constraint("v_nonneg", "v >= 0")
    files_before = set(_entry(t, t.current_version())["files"])
    with pytest.raises(ConstraintViolationError):
        t.update({"k": (0, 3)}, {"v": "v - 1e9"}, defer=True)
    # refused publish left no orphan data files
    import os
    data_root = os.path.join(str(tmp_path / "tbl"), "data")
    on_disk = {os.path.join(dp, f) for dp, _, fs in os.walk(data_root)
               for f in fs if not f.startswith(("_", "."))}
    referenced = set()
    for v in range(t.current_version() + 1):
        referenced |= set(_entry(t, v)["files"])
    assert on_disk <= referenced
    import datetime
    with pytest.raises(ValueError, match="JSON-native"):
        t.update({"k": (datetime.date(2020, 1, 1), None)},
                 {"v": "v"}, defer=True)


def test_mv_refresh_across_deferred_update(spark, tmp_path, mk_table):
    """the MV delta sees the deferred update exactly: old images
    retract, post-images insert, view == flat recompute."""
    from aws_data_pipeline_ads_spark.lakemv import LakeMaterializedView

    t = mk_table(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame(
        [Row(doc_id=i, lang=("en", "fr", "de")[i % 3],
             n_chars=i * 10) for i in range(300)],
        "doc_id long, lang string, n_chars long")
        .repartitionByRange(4, "doc_id"), "overwrite")
    mv = LakeMaterializedView(
        spark, t, str(tmp_path / "mv"), key="doc_id",
        group_cols=["lang"], measures=["n_chars"])
    mv.refresh()
    t.update({"doc_id": (10, 29)}, {"n_chars": "n_chars + 7"},
             defer=True)
    mv.refresh()
    exp = _rows(t.read().groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("n_chars").alias("n_n_chars"),
        F.sum(F.col("n_chars").cast("decimal(38,6)"))
        .alias("sum_n_chars")))
    assert _rows(mv.read()) == exp
