"""Shallow CLONE: zero-copy table forks with ownership-guarded vacuum.

A clone's v0 references the SOURCE's data files byte-for-byte (no
copy); both logs then diverge freely. The two deletion hazards are
pinned: a clone's vacuum must never reach into the source's data dir
(ownership guard), and the source's vacuum honors the clone's pin tag
until it is explicitly released.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aws_data_pipeline_ads_spark.catalog import load_table
from aws_data_pipeline_ads_spark.lakelog import LakeTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture
def src_table(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    t = LakeTable(spark, str(tmp_path / "src"))
    t.commit(docs.repartitionByRange(8, "doc_id"))
    return t, docs


def test_clone_is_zero_copy_and_equal(spark, src_table, tmp_path):
    t, docs = src_table
    c = t.clone(str(tmp_path / "dev"))
    assert _rows(c.read()) == _rows(t.read())
    # ZERO copy: the clone's v0 references the source's files verbatim
    assert set(c._read_entry(0)["files"]) == set(
        t._read_entry(t.current_version())["files"])
    assert not os.path.exists(str(tmp_path / "dev" / "data"))
    # lineage rides the txn id
    assert c.history()[0]["txn_id"].startswith("clone:")
    # stats ride along: a pruned range scan opens < all files
    opened = c.scan({"doc_id": (0, 50)}).inputFiles()
    assert 0 < len(opened) < len(c.read().inputFiles())


def test_clone_diverges_both_ways(spark, src_table, tmp_path):
    t, docs = src_table
    c = t.clone(str(tmp_path / "dev"))
    before = _rows(t.read())
    c.delete({"doc_id": (0, 99)})
    c.commit(docs.filter(F.col("doc_id") < 10)
             .withColumn("doc_id", F.col("doc_id") + 10_000_000),
             "append")
    assert _rows(t.read()) == before          # source untouched
    t.update({"doc_id": (200, 299)}, {"n_chars": F.lit(1)})
    # clone untouched by the source's divergence
    assert c.read().where(
        (F.col("doc_id").between(200, 299))
        & (F.col("n_chars") == 1)).count() == 0


def test_clone_vacuum_never_touches_source_files(spark, src_table,
                                                 tmp_path):
    """THE hazard: the clone's early versions reference source-owned
    files; after the clone diverges and vacuums, those files must
    survive — vacuum only deletes under its own data/ dir."""
    t, docs = src_table
    c = t.clone(str(tmp_path / "dev"), pin_tag=False)
    src_files = set(t._read_entry(t.current_version())["files"])
    c.commit(docs.filter(F.col("doc_id") < 50), "overwrite")
    assert c.vacuum(keep_last=1) == 0          # borrowed files skipped
    assert all(os.path.exists(f) for f in src_files)
    assert _rows(t.read()) == _rows(docs.repartition(1))
    # the clone's OWN files are still reclaimable
    c.commit(docs.filter(F.col("doc_id") < 20), "overwrite")
    assert c.vacuum(keep_last=1) > 0           # v1's own files die
    assert c.read().count() == 20


def test_vacuum_ownership_is_directory_exact(spark, src_table, tmp_path):
    """The ownership guard must be a DIRECTORY prefix, not a string
    prefix: a borrowed file under a sibling path sharing the '<path>data'
    spelling ('<path>data-x/…', '<path>/datasets/…') used to pass the
    bare startswith and get deleted by a vacuum of a table that does
    not own it (the r10 advice find)."""
    t, docs = src_table
    base = str(tmp_path / "tbl")
    t2 = LakeTable(spark, base)
    t2.commit(docs.limit(10))
    # two files a table at `base` does NOT own, but whose paths share
    # the '<base>/data' string prefix
    sib1 = tmp_path / "tbl" / "datasets" / "borrowed.parquet"
    sib2 = tmp_path / "tbl" / "data-x" / "borrowed.parquet"
    for s in (sib1, sib2):
        s.parent.mkdir(parents=True)
        docs.limit(1).toPandas().to_parquet(str(s))
    # an old version references the borrowed files; the head does not
    head = t2.current_version()
    entry = t2._read_entry(head)
    t2._publish(entry["files"] + [str(sib1), str(sib2)], "append",
                None, head + 1, schema=t2._entry_schema(entry))
    t2.commit(docs.limit(5), "overwrite")
    t2.vacuum(keep_last=1)
    assert sib1.exists() and sib2.exists()     # never owned, never deleted


def test_source_vacuum_honors_clone_pin(spark, src_table, tmp_path):
    t, docs = src_table
    c = t.clone(str(tmp_path / "dev"))         # pin_tag=True default
    assert "clone-dev" in t.tags()
    t.commit(docs.filter(F.col("doc_id") < 5), "overwrite")
    assert t.vacuum(keep_last=1) == 0          # pinned version retained
    assert c.read().count() == docs.count()    # clone still readable
    # releasing the pin makes the shared files reclaimable
    t.delete_tag("clone-dev")
    assert t.vacuum(keep_last=1) > 0
    with pytest.raises(Exception):
        c.read().collect()                     # documented caveat


def test_clone_of_tagged_version(spark, src_table, tmp_path):
    t, docs = src_table
    t.tag("audit", t.current_version())
    t.update({"doc_id": (0, 99)}, {"n_chars": F.lit(7)})
    c = t.clone(str(tmp_path / "dev"), version="audit", pin_tag=False)
    assert c.read().where(
        (F.col("doc_id") <= 99) & (F.col("n_chars") == 7)).count() == 0
    with pytest.raises(ValueError, match="already holds"):
        t.clone(str(tmp_path / "dev"))
    with pytest.raises(ValueError, match="no commits"):
        LakeTable(spark, str(tmp_path / "empty")).clone(
            str(tmp_path / "dev2"))
