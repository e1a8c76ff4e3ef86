"""Generated columns (Delta GENERATED ALWAYS AS semantics)
(aws_data_pipeline_ads_spark/lakelog.py set_generated_column /
drop_generated / _enforce_generated).

A declared column is either OMITTED by a write (materialized at commit
from its expression) or provided with the exact generated value —
divergence refuses on every row-introducing path (commit, merge,
update). Declarations are a table property: carried by every commit,
survive compact/restore, ride clone; rename/drop of the column or its
inputs refuse while the declaration stands."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row, functions as F

from aws_data_pipeline_ads_spark.lakelog import (
    ConditionalPutCommitBackend,
    ConstraintViolationError,
    LakeTable,
)


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


def _mk(spark, mk_table, path, n=20):
    t = mk_table(path)
    t.commit(spark.createDataFrame(
        [Row(k=i, v=i * 3, band=(i * 3) // 10) for i in range(n)],
        "k long, v long, band long"), "overwrite")
    t.set_generated_column("band", "v div 10")
    return t


def test_declare_validates_head_and_materializes_appends(
        spark, tmp_path, mk_table):
    t = _mk(spark, mk_table, str(tmp_path / "tbl"))
    assert t.generated_columns() == {"band": "v div 10"}
    # append WITHOUT the column: materialized at write
    t.commit(spark.createDataFrame([Row(k=100, v=47)],
                                   "k long, v long"), "append")
    got = {r.k: r.band for r in t.read().collect()}
    assert got[100] == 4
    # append WITH the exact value: passes
    t.commit(spark.createDataFrame([Row(k=101, v=52, band=5)],
                                   "k long, v long, band long"),
             "append")
    assert {r.band for r in t.read().filter(F.col("k") == 101)
            .collect()} == {5}


def test_divergent_values_refuse_everywhere(spark, tmp_path, mk_table):
    t = _mk(spark, mk_table, str(tmp_path / "tbl"))
    bad = spark.createDataFrame([Row(k=200, v=47, band=9)],
                                "k long, v long, band long")
    with pytest.raises(ConstraintViolationError, match="generated"):
        t.commit(bad, "append")
    with pytest.raises(ConstraintViolationError, match="generated"):
        t.merge(t.read().limit(1).withColumn("band", F.lit(99)), "k")
    with pytest.raises(ConstraintViolationError, match="generated"):
        # UPDATE that changes v but not band breaks the invariant
        t.update({"k": (0, 0)}, {"v": "v + 1000"})
    # the honest update recomputes both
    t.update({"k": (0, 0)}, {"v": "v + 1000", "band": "(v + 1000) div 10"})
    assert {(r.v, r.band) for r in t.read().filter(F.col("k") == 0)
            .collect()} == {(1000, 100)}


def test_declare_refuses_divergent_head_and_missing_col(
        spark, tmp_path, mk_table):
    t = mk_table(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([Row(k=1, v=7, band=9)],
                                   "k long, v long, band long"),
             "overwrite")
    with pytest.raises(ConstraintViolationError, match="diverge"):
        t.set_generated_column("band", "v div 10")
    with pytest.raises(ValueError, match="no column"):
        t.set_generated_column("nope", "v div 10")


def test_declaration_survives_compact_restore_clone(
        spark, tmp_path, mk_table):
    t = _mk(spark, mk_table, str(tmp_path / "tbl"))
    t.compact(target_bytes=1 << 30)
    assert t.generated_columns() == {"band": "v div 10"}
    c = t.clone(str(tmp_path / "clone"))
    assert c.generated_columns() == {"band": "v div 10"}
    t.drop_generated("band")
    assert t.generated_columns() == {}
    t.restore(1)  # the set_generated commit
    assert t.generated_columns() == {"band": "v div 10"}
    # and a pre-declaration restore clears it again
    t.restore(0)
    assert t.generated_columns() == {}


def test_rename_drop_refuse_generated_and_inputs(
        spark, tmp_path, mk_table):
    t = _mk(spark, mk_table, str(tmp_path / "tbl"))
    with pytest.raises(ValueError, match="GENERATED"):
        t.rename_column("band", "bucket")
    with pytest.raises(ValueError, match="derive"):
        t.rename_column("v", "val")
    with pytest.raises(ValueError, match="derive"):
        t.drop_column("v")
    t.drop_generated("band")
    t.rename_column("band", "bucket")  # now fine
    assert t.read().columns == ["k", "v", "bucket"]


def test_generated_materializes_on_overwrite(spark, tmp_path, mk_table):
    """overwrite without the column: the pinned schema gains the
    materialized column (schema re-resolved post-materialization)."""
    t = _mk(spark, mk_table, str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([Row(k=1, v=25)],
                                   "k long, v long"), "overwrite")
    got = t.read().collect()
    assert len(got) == 1 and got[0].band == 2
    assert "band" in t.read().columns
