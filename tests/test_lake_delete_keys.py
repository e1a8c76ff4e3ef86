"""delete_keys: row deletion by KEY SET (takedown / GDPR shape).

Copy-on-write rewrites only the stats+bloom-covered files; defer=True
is an O(1) merge-on-read commit whose key-set predicate every read
path applies, compaction materializes, and MV deltas see with exact
per-file scoping.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_data_pipeline_ads_spark.catalog import load_table
from aws_data_pipeline_ads_spark.lakelog import LakeTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture
def tbl(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    t = LakeTable(spark, str(tmp_path / "t"))
    t.commit(docs.repartitionByRange(8, "doc_id"),
             bloom_cols=["doc_id"])
    return t, docs


def test_cow_delete_keys_bounded_rewrite(spark, tbl):
    t, docs = tbl
    victims = [3, 57, 211]
    old_files = set(t._read_entry(t.current_version())["files"])
    t.delete_keys("doc_id", victims)
    assert _rows(t.read()) == _rows(
        docs.where(~F.col("doc_id").isin(victims)))
    new_files = set(t._read_entry(t.current_version())["files"])
    # bounded rewrite: most files are SHARED with the old version
    assert len(old_files & new_files) > 0
    assert len(new_files - old_files) < len(old_files)


def test_defer_delete_keys_is_o1_and_invisible(spark, tbl, tmp_path):
    t, docs = tbl
    victims = [r[0] for r in docs.select("doc_id").orderBy("doc_id")
               .limit(50).collect()][::17][:3]   # 3 real, spread ids
    head_entry = t._read_entry(t.current_version())
    v = t.delete_keys("doc_id", victims, defer=True, txn_id="gdpr-1")
    # O(1): the file list is byte-identical — nothing rewritten
    assert t._read_entry(v)["files"] == head_entry["files"]
    # the predicate scope is TIGHT: only files that can hold the keys
    dd = t._read_entry(v)["deferred_deletes"][-1]
    assert 0 < len(dd["files"]) < len(head_entry["files"])
    # invisible on every read path
    assert t.read().where(F.col("doc_id").isin(victims)).count() == 0
    assert t.scan({"doc_id": (0, 600)}).where(
        F.col("doc_id").isin(victims)).count() == 0
    assert t.scan_point({"doc_id": victims[0]}).count() == 0
    # time travel still shows them
    assert t.read(v - 1).where(
        F.col("doc_id").isin(victims)).count() == len(victims)
    # replay is a no-op
    assert t.delete_keys("doc_id", victims, defer=True,
                         txn_id="gdpr-1") == v
    # stats refuses while pending; compact materializes
    with pytest.raises(ValueError, match="deferred"):
        t.stats()
    t.compact(target_bytes=1 << 30)
    assert not t._read_entry(t.current_version()).get("deferred_deletes")
    assert _rows(t.read()) == _rows(
        docs.where(~F.col("doc_id").isin(victims)))


def test_null_keys_never_match(spark, tmp_path):
    from pyspark.sql import Row

    t = LakeTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame(
        [Row(doc_id=1, x="a"), Row(doc_id=None, x="b")],
        "doc_id long, x string"))
    t.delete_keys("doc_id", [1], defer=True)
    assert [r["x"] for r in t.read().collect()] == ["b"]
    t2 = LakeTable(spark, str(tmp_path / "t2"))
    t2.commit(spark.createDataFrame(
        [Row(doc_id=1, x="a"), Row(doc_id=None, x="b")],
        "doc_id long, x string"))
    t2.delete_keys("doc_id", [1])
    assert [r["x"] for r in t2.read().collect()] == ["b"]


def test_defer_guards(spark, tbl):
    t, docs = tbl
    with pytest.raises(ValueError, match="at least one value"):
        t.delete_keys("doc_id", [])
    with pytest.raises(ValueError, match="JSON-native"):
        import datetime
        t.delete_keys("doc_id", [datetime.datetime.now()], defer=True)


def test_cow_delete_keys_naive_datetime_hostile_os_tz(spark, sf_dir,
                                                      tmp_path):
    """A NAIVE datetime key must mean the same instant to the cover
    pruner and to the exact isin filter. PySpark converts naive
    datetimes through time.mktime (the OS TZ env var), while file
    stats and bloom keys are UTC instants — a cover probing stats with
    the raw naive value (or blooms with the unlocalized one) would,
    under a non-UTC process zone, EXCLUDE the file holding the key:
    the rewrite never opens it and the row silently survives its own
    takedown (the r10 advice find — _keyset_cover now goes through
    _bound_key/_probe_value exactly like scan_point)."""
    import os
    import time as _time

    from aws_data_pipeline_ads_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    t = LakeTable(spark, str(tmp_path / "tbl"))
    t.commit(ev.repartitionByRange(8, "ts"), bloom_cols=["ts"])
    prev_tz = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    _time.tzset()
    try:
        # collect() hands back naive OS-local wall times — exactly the
        # key a user would pass into delete_keys
        victims = [r["ts"] for r in
                   ev.orderBy("ts").limit(500).collect()][::170][:3]
        assert all(v.tzinfo is None for v in victims)
        n_before = t.read().count()
        n_victim_rows = t.read().filter(F.col("ts").isin(victims)).count()
        assert n_victim_rows >= len(victims)
        old_files = set(t._read_entry(t.current_version())["files"])
        t.delete_keys("ts", victims)
        # every victim row is really gone...
        assert t.read().filter(F.col("ts").isin(victims)).count() == 0
        assert t.read().count() == n_before - n_victim_rows
        # ...and the cover still PRUNED (bounded rewrite, not full)
        new_files = set(t._read_entry(t.current_version())["files"])
        assert len(old_files & new_files) > 0
    finally:
        if prev_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = prev_tz
        _time.tzset()


def test_mv_refresh_across_deferred_key_delete(spark, tbl, tmp_path):
    """The MV delta must see a deferred KEY delete exactly: covered
    files change signature, the delta emits the vanished rows as −1,
    and the refreshed view equals a recompute."""
    from aws_data_pipeline_ads_spark.lakemv import LakeMaterializedView

    t, docs = tbl
    mv = LakeMaterializedView(
        spark, t, str(tmp_path / "mv"), key="doc_id",
        group_cols=["lang"], measures=["n_chars"])
    mv.refresh()
    t.delete_keys("doc_id", [7, 8, 9, 300], defer=True)
    mv.refresh()
    exp = _rows(t.read().groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("n_chars").alias("n_n_chars"),
        F.sum(F.col("n_chars").cast("decimal(38,6)"))
        .alias("sum_n_chars")))
    assert _rows(mv.read()) == exp
