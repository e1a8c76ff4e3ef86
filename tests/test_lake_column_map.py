"""Column mapping: metadata-only rename/drop, stable physical names
(aws_data_pipeline_ads_spark/lakelog.py rename_column / drop_column).

Delta/Iceberg column-mapping parity: a rename or drop is one log
write — no file is rewritten, per-file stats/blooms/sums stay keyed by
the stable PHYSICAL name and keep pruning, time travel shows each
version under its own names, and a re-added dropped column can never
resurrect old bytes from shared files."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row, functions as F

from aws_data_pipeline_ads_spark.lakelog import (
    ConcurrentWriteError,
    ConditionalPutCommitBackend,
    LakeTable,
    SchemaMismatchError,
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


def _base(spark, n=100):
    return spark.createDataFrame(
        [Row(k=i, v=float(i), grp=i % 5) for i in range(n)])


def test_rename_is_metadata_only(spark, tmp_path, mk_table):
    """rename shares every data file with the prior version, the new
    head reads under the new name with identical values, and time
    travel still shows the old name."""
    t = mk_table(str(tmp_path / "tbl"))
    t.commit(_base(spark), "overwrite")
    before = _entry(t, 0)["files"]
    v = t.rename_column("v", "val")
    assert v == 1
    assert _entry(t, 1)["files"] == before  # zero files rewritten
    got = t.read()
    assert got.columns == ["k", "val", "grp"]
    assert _rows(got.select("k", "val")) == [(i, float(i))
                                             for i in range(100)]
    old = t.read(0)
    assert old.columns == ["k", "v", "grp"]
    assert _entry(t, 1)["column_map"] == {"val": "v"}


def test_rename_back_clears_map(spark, tmp_path, mk_table):
    t = mk_table(str(tmp_path / "tbl"))
    t.commit(_base(spark), "overwrite")
    t.rename_column("v", "val")
    t.rename_column("val", "v")
    assert "column_map" not in _entry(t, 2)
    assert t.read().columns == ["k", "v", "grp"]


def test_append_after_rename(spark, tmp_path, mk_table):
    """an append under the NEW logical name lands physically under the
    old name, so the whole table reads uniformly at head AND the
    pre-rename version never sees the appended rows."""
    t = mk_table(str(tmp_path / "tbl"))
    t.commit(_base(spark, 10), "overwrite")
    t.rename_column("v", "val")
    extra = spark.createDataFrame(
        [Row(k=100 + i, val=float(100 + i), grp=0) for i in range(5)])
    t.commit(extra, "append")
    got = t.read()
    assert got.count() == 15
    assert _rows(got.filter(F.col("k") >= 100).select("k", "val")) == [
        (100 + i, float(100 + i)) for i in range(5)]
    # physical layout: appended files store the column under "v"
    import pyarrow.parquet as pq

    new_files = [f for f in _entry(t, 2)["files"]
                 if f not in _entry(t, 1)["files"]]
    assert new_files
    names = set(pq.ParquetFile(new_files[0]).schema_arrow.names)
    assert "v" in names and "val" not in names


def test_rename_keeps_pruning(spark, tmp_path, mk_table):
    """scan() on the renamed column prunes from the per-file stats
    collected under the physical name — zero recomputation."""
    t = mk_table(str(tmp_path / "tbl"))
    for lo in (0, 1000, 2000):
        t.commit(
            spark.createDataFrame(
                [Row(k=lo + i, v=float(lo + i), grp=0) for i in range(50)]
            ).coalesce(1),
            "append" if lo else "overwrite")
    t.rename_column("k", "key")
    entry = _entry(t, 3)
    keep, never = t._split_files(entry, {"key": (1000, 1049)})
    assert len(keep) == 1 and len(never) == 2
    got = t.scan({"key": (1000, 1049)})
    assert got.count() == 50
    assert got.columns == ["key", "v", "grp"]


def test_rename_keeps_bloom_point_lookup(spark, tmp_path, mk_table):
    t = mk_table(str(tmp_path / "tbl"))
    for lo in (0, 1000):
        t.commit(
            spark.createDataFrame(
                [Row(k=lo + i, v=float(i), grp=0) for i in range(50)]
            ).coalesce(1),
            "append" if lo else "overwrite", bloom_cols=["k"])
    t.rename_column("k", "key")
    got = t.scan_point({"key": 1007})
    assert _rows(got.select("key")) == [(1007,)]


def test_rename_keeps_metadata_sums(spark, tmp_path, mk_table):
    """stats() reports under the LOGICAL name after a rename, same
    exact decimal sums, zero files opened."""
    t = mk_table(str(tmp_path / "tbl"))
    t.commit(_base(spark, 10), "overwrite", sum_cols=["v"])
    t.rename_column("v", "val")
    s = t.stats()
    assert s["sum"]["val"] == sum(float(i) for i in range(10))
    assert "v" not in s["sum"]
    assert s["min"]["val"] == 0.0 and s["max"]["val"] == 9.0


def test_drop_column_metadata_only(spark, tmp_path, mk_table):
    t = mk_table(str(tmp_path / "tbl"))
    t.commit(_base(spark, 20), "overwrite")
    before = _entry(t, 0)["files"]
    t.drop_column("v")
    assert _entry(t, 1)["files"] == before
    assert t.read().columns == ["k", "grp"]
    assert t.read(0).columns == ["k", "v", "grp"]  # time travel intact
    assert _entry(t, 1)["phys_used"] == ["v"]
    # stats() no longer reports the dropped column
    s = t.stats()
    assert "v" not in s["min"]


def test_drop_then_readd_never_resurrects(spark, tmp_path, mk_table):
    """the core column-mapping safety property: re-adding a dropped
    name via evolve-append reads NULL for every pre-existing row —
    the old bytes in shared files stay invisible forever."""
    t = mk_table(str(tmp_path / "tbl"))
    t.commit(_base(spark, 10), "overwrite")
    t.drop_column("v")
    extra = spark.createDataFrame(
        [Row(k=100, grp=0, v=123.0)])
    t.commit(extra, "append", evolve=True)
    got = t.read()
    assert set(got.columns) == {"k", "grp", "v"}
    old_vals = _rows(got.filter(F.col("k") < 100).select("v"))
    assert old_vals == [(None,)] * 10  # never 0.0..9.0 back
    assert _rows(got.filter(F.col("k") == 100).select("v")) == [(123.0,)]
    # the fresh physical name is recorded and distinct from the retired
    cmap = _entry(t, 2)["column_map"]
    assert cmap["v"] != "v"
    assert "v" in _entry(t, 2)["phys_used"]


def test_drop_prunes_bloom_and_sums(spark, tmp_path, mk_table):
    t = mk_table(str(tmp_path / "tbl"))
    t.commit(_base(spark, 10), "overwrite",
             bloom_cols=["k"], sum_cols=["v"])
    t.drop_column("v")
    e = _entry(t, 1)
    assert e.get("sum_cols") is None or "v" not in e["sum_cols"]
    assert e["bloom_cols"] == ["k"]  # untouched
    t.drop_column("k")
    e = _entry(t, 2)
    assert "bloom_cols" not in e or not e["bloom_cols"]


def test_refusals(spark, tmp_path, mk_table):
    t = mk_table(str(tmp_path / "tbl"))
    t.commit(_base(spark, 10), "overwrite")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("v", "k")
    with pytest.raises(ValueError, match="no column"):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="no-op"):
        t.rename_column("v", "v")
    t.set_constraint("v_pos", "v >= 0")
    with pytest.raises(ValueError, match="constraint"):
        t.rename_column("v", "val")
    with pytest.raises(ValueError, match="constraint"):
        t.drop_column("v")
    t.drop_constraint("v_pos")
    t.delete({"v": (0.0, 1.0)}, defer=True)
    with pytest.raises(ValueError, match="deferred"):
        t.rename_column("v", "val")
    t.compact()  # materialize the deferred delete
    t.rename_column("v", "val")  # now fine
    t.drop_column("val")
    with pytest.raises(ValueError, match="no column"):
        t.drop_column("val")
    t.drop_column("grp")
    with pytest.raises(ValueError, match="last column"):
        t.drop_column("k")


def test_restore_across_rename(spark, tmp_path, mk_table):
    """restore to a pre-rename version pins THAT version's names and
    un-retires physicals live in the restored schema, so appends after
    the restore keep working."""
    t = mk_table(str(tmp_path / "tbl"))
    t.commit(_base(spark, 10), "overwrite")
    t.rename_column("v", "val")
    t.drop_column("grp")
    t.restore(0)
    got = t.read()
    assert got.columns == ["k", "v", "grp"]
    assert "column_map" not in _entry(t, 3)
    assert not _entry(t, 3).get("phys_used")
    t.commit(spark.createDataFrame([Row(k=100, v=1.0, grp=9)]), "append")
    assert t.read().count() == 11
    assert _rows(t.read().filter(F.col("k") == 100).select("grp")) == [(9,)]


def test_clone_carries_map(spark, tmp_path, mk_table):
    t = mk_table(str(tmp_path / "tbl"))
    t.commit(_base(spark, 10), "overwrite")
    t.rename_column("v", "val")
    t.drop_column("grp")
    c = t.clone(str(tmp_path / "clone"))
    got = c.read()
    assert got.columns == ["k", "val"]
    assert _rows(got.select("val")) == [(float(i),) for i in range(10)]
    e0 = _entry(c, 0)
    assert e0["column_map"] == {"val": "v"}
    assert e0["phys_used"] == ["grp"]


def test_cow_rewrites_compose_with_map(spark, tmp_path, mk_table):
    """delete/update/compact after a rename: logical predicates, files
    rewritten under the stable physical names, values correct."""
    t = mk_table(str(tmp_path / "tbl"))
    t.commit(_base(spark, 20), "overwrite")
    t.rename_column("v", "val")
    t.delete({"val": (0.0, 4.0)})
    assert t.read().count() == 15
    t.update({"val": (10.0, 10.0)}, {"val": "val + 1000"})
    assert _rows(t.read().filter(F.col("k") == 10).select("val")) == [
        (1010.0,)]
    t.compact(target_bytes=1 << 30)
    assert t.read().count() == 15
    got = t.read()
    assert got.columns == ["k", "val", "grp"]


def test_merge_evolve_refuses_recycled_name(spark, tmp_path, mk_table):
    t = mk_table(str(tmp_path / "tbl"))
    t.commit(_base(spark, 10), "overwrite")
    t.drop_column("v")
    src = spark.createDataFrame([Row(k=1, grp=0, v=9.0)])
    with pytest.raises(SchemaMismatchError, match="recycle"):
        t.merge_clauses(src, "k", matched_update={"grp": "src_grp"},
                        evolve=True)


def test_concurrent_rename_vs_append_surfaces(spark, tmp_path):
    """an append whose files were written under a map that a competing
    rename invalidated must DISCARD and raise, never publish bytes the
    new map misreads."""
    path = str(tmp_path / "tbl")
    t = LakeTable(spark, path)
    t.commit(_base(spark, 10), "overwrite")

    racer = LakeTable(spark, path)

    class RacingTable(LakeTable):
        def _write_files(self, df, cmap=None):
            files = super()._write_files(df, cmap=cmap)
            # competitor renames between our write and our publish
            if racer._head_cmap() == {}:
                racer.rename_column("v", "val")
            return files

    rt = RacingTable(spark, path)
    extra = spark.createDataFrame([Row(k=100, v=5.0, grp=0)])
    with pytest.raises(ConcurrentWriteError, match="column mapping"):
        rt.commit(extra, "append", retries=3)
    # the discarded files are not referenced anywhere and the table
    # stays consistent under the rename
    assert t.read().columns == ["k", "val", "grp"]
    assert t.read().count() == 10


def test_widen_column_metadata_only(spark, tmp_path, mk_table):
    """int→long widening: one log write, zero files rewritten, values
    BEYOND int range append fine, old narrow files upcast at scan,
    time travel keeps the narrow schema."""
    t = mk_table(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame(
        [Row(k=i, v=i * 10) for i in range(20)], "k long, v int"),
        "overwrite")
    before = _entry(t, 0)["files"]
    t.widen_column("v", "long")
    assert _entry(t, 1)["files"] == before
    assert dict(t.read().dtypes)["v"] == "bigint"
    assert dict(t.read(0).dtypes)["v"] == "int"  # time travel narrow
    big = 1 << 40
    t.commit(spark.createDataFrame([Row(k=100, v=big)],
                                   "k long, v long"), "append")
    got = dict((r.k, r.v) for r in t.read().collect())
    assert got[100] == big and got[3] == 30


def test_widen_keeps_pruning_across_mixed_files(spark, tmp_path, mk_table):
    t = mk_table(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame(
        [Row(k=i, v=float(i)) for i in range(50)],
        "k int, v double").coalesce(1), "overwrite")
    t.widen_column("k", "long")
    t.commit(spark.createDataFrame(
        [Row(k=(1 << 35) + i, v=float(i)) for i in range(50)],
        "k long, v double").coalesce(1), "append")
    entry = _entry(t, 2)
    keep, never = t._split_files(entry, {"k": (0, 49)})
    assert len(keep) == 1 and len(never) == 1  # int-file stats still prune
    assert t.scan({"k": (0, 49)}).count() == 50


def test_widen_refusals_and_matrix(spark, tmp_path, mk_table):
    t = mk_table(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame(
        [Row(k=1, v=1.5, s="x")], "k int, v float, s string"),
        "overwrite")
    with pytest.raises(ValueError, match="not a lossless"):
        t.widen_column("k", "short")  # narrowing
    with pytest.raises(ValueError, match="not a lossless"):
        t.widen_column("s", "long")  # string -> numeric
    with pytest.raises(ValueError, match="already"):
        t.widen_column("k", "int")
    with pytest.raises(ValueError, match="no column"):
        t.widen_column("zz", "long")
    t.widen_column("v", "double")
    t.widen_column("k", "double")  # integral -> double allowed
    assert dict(t.read().dtypes) == {"k": "double", "v": "double",
                                     "s": "string"}
    assert t.read().collect()[0].k == 1.0


def test_widen_composes_with_rename(spark, tmp_path, mk_table):
    """widen + rename stack: physical name AND narrow pages both stay
    put; reads map name and width simultaneously."""
    t = mk_table(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame(
        [Row(k=i, v=i) for i in range(10)], "k long, v int"),
        "overwrite", sum_cols=["v"])
    t.widen_column("v", "long")
    t.rename_column("v", "val")
    got = t.read()
    assert dict(got.dtypes)["val"] == "bigint"
    assert sorted(r.val for r in got.collect()) == list(range(10))
    s = t.stats()
    assert s["sum"]["val"] == sum(range(10))
    t.commit(spark.createDataFrame(
        [Row(k=99, val=(1 << 40))], "k long, val long"), "append")
    assert t.stats()["sum"]["val"] == sum(range(10)) + (1 << 40)


def test_zorder_after_rename_prunes(spark, tmp_path, mk_table):
    """OPTIMIZE ZORDER on the RENAMED column: the rewrite lands under
    the stable physical names, fresh stats are collected physically,
    and the scan on the logical name prunes the re-clustered layout."""
    t = mk_table(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame(
        [Row(k=i, v=float(i % 97)) for i in range(2000)],
        "k long, v double").repartition(8), "overwrite")
    t.rename_column("k", "key")
    t.optimize_zorder(["key"], n_files=8)
    entry = _entry(t, 2)
    keep, never = t._split_files(entry, {"key": (0, 249)})
    assert len(never) > 0  # clustered layout prunes
    got = t.scan({"key": (0, 249)})
    assert got.count() == 250
    assert got.columns == ["key", "v"]


def test_delete_keys_and_merge_cover_after_rename(spark, tmp_path,
                                                  mk_table):
    """the key-set cover (delete_keys / merge_clauses) probes stats
    and blooms under the PHYSICAL name: after a rename — and after a
    rename CYCLE that re-uses an old name — the takedown stays
    bounded AND deletes the right rows."""
    t = mk_table(str(tmp_path / "tbl"))
    for lo in (0, 1000):
        t.commit(
            spark.createDataFrame(
                [Row(a=lo + i, b=float(lo + i)) for i in range(50)]
            ).coalesce(1),
            "append" if lo else "overwrite", bloom_cols=["a"])
    t.rename_column("a", "key")
    before = set(_entry(t, t.current_version())["files"])
    t.delete_keys("key", [1005])
    after = set(_entry(t, t.current_version())["files"])
    assert len(before & after) == 1  # cover pruned: one file rewritten
    assert t.read().filter(F.col("key") == 1005).count() == 0
    assert t.read().count() == 99
    # rename CYCLE: key->tmp, then b->... reuse is refused by collision,
    # so exercise the subtler shape: stats for physical 'a' must never
    # be read under logical 'b'
    t.rename_column("b", "bval")
    t.rename_column("key", "b")  # logical 'b' now maps to physical 'a'
    t.delete_keys("b", [1007])
    assert t.read().filter(F.col("b") == 1007).count() == 0
    assert t.read().count() == 98
    src = spark.createDataFrame([Row(b=3, bval=9999.0)])
    t.merge_clauses(src, "b", matched_update={"bval": "src_bval"})
    got = dict((r.b, r.bval) for r in t.read()
               .filter(F.col("b") == 3).collect())
    assert got == {3: 9999.0}  # updated in place, no duplicate key
