"""commit_expect: DLT-style row-level expectations at lake write.

Valid rows commit, violating rows quarantine into their own versioned
LakeTable (or drop, or refuse the whole batch loudly) — and the split
is exact: committed + quarantined == input, per-rule counts match a
flat recompute, NULL predicate results are violations.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aws_data_pipeline_ads_spark.catalog import load_table
from aws_data_pipeline_ads_spark.lakelog import (
    ExpectationViolationError,
    LakeTable,
)

RULES = {
    "chars_positive": "n_chars > 0",
    "lang_known": "lang IS NOT NULL AND lang <> ''",
    "chars_cap": "n_chars < 2000",
}


@pytest.fixture
def dirty(spark, sf_dir):
    """documents with planted violations: zero/negative chars, a NULL
    lang (NULL predicate result must count as a violation), and
    whatever rows naturally exceed the cap."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    planted = spark.createDataFrame(
        [Row(doc_id=900001, lang="aa", n_chars=0),
         Row(doc_id=900002, lang=None, n_chars=10),
         Row(doc_id=900003, lang="", n_chars=-5)],
        "doc_id long, lang string, n_chars long")
    return docs.unionByName(planted)


def test_quarantine_split_is_exact(spark, dirty, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    m = t.commit_expect(dirty, RULES, txn_id="b0")
    n_in = dirty.count()
    assert m["rows_in"] == n_in
    assert m["rows_committed"] + m["rows_quarantined"] == n_in
    assert m["rows_committed"] == t.read().count()
    q = LakeTable(spark, str(tmp_path / "t_quarantine"))
    assert m["rows_quarantined"] == q.read().count()
    # committed rows satisfy EVERY rule; quarantined rows name each
    # failed rule exactly
    good = t.read()
    assert good.where(~F.expr(" AND ".join(
        f"({p})" for p in RULES.values()))).count() == 0
    per_rule = {n: dirty.where(
        ~F.coalesce(F.expr(p), F.lit(False))).count()
        for n, p in RULES.items()}
    assert m["violations"] == per_rule
    got_rule_counts = dict(
        q.read().select(F.explode("_violations").alias("r"))
        .groupBy("r").count().collect())
    assert got_rule_counts == {n: c for n, c in per_rule.items() if c}
    # NULL lang really violated (NULL predicate != pass)
    assert q.read().where(F.col("lang").isNull()).count() == 1
    # quarantine rows point at the version their siblings became
    assert {r["_src_version"] for r in
            q.read().select("_src_version").distinct().collect()} \
        == {m["version"]}


def test_quarantine_appends_across_batches(spark, dirty, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    m0 = t.commit_expect(dirty.where(F.col("doc_id") % 2 == 0), RULES,
                         txn_id="b0")
    m1 = t.commit_expect(dirty.where(F.col("doc_id") % 2 == 1), RULES,
                         mode="append", txn_id="b1")
    q = LakeTable(spark, str(tmp_path / "t_quarantine"))
    assert q.read().count() == (m0["rows_quarantined"]
                                + m1["rows_quarantined"])
    # replay returns the original versions, commits nothing twice
    m1b = t.commit_expect(dirty.where(F.col("doc_id") % 2 == 1), RULES,
                          mode="append", txn_id="b1")
    assert m1b["version"] == m1["version"]
    assert m1b["quarantine_version"] == m1["quarantine_version"]
    assert q.read().count() == (m0["rows_quarantined"]
                                + m1["rows_quarantined"])


def test_drop_and_fail_modes(spark, dirty, tmp_path):
    t = LakeTable(spark, str(tmp_path / "td"))
    m = t.commit_expect(dirty, RULES, on_violation="drop", txn_id="b0")
    assert m["rows_quarantined"] == 0
    assert t.read().count() == m["rows_committed"]
    import os
    assert not os.path.exists(str(tmp_path / "td_quarantine"))

    tf = LakeTable(spark, str(tmp_path / "tf"))
    with pytest.raises(ExpectationViolationError, match="chars_positive"):
        tf.commit_expect(dirty, RULES, on_violation="fail")
    assert tf.current_version() is None        # nothing committed
    # a clean batch under "fail" commits normally
    clean = dirty.where(F.expr(" AND ".join(
        f"coalesce({p}, false)" for p in RULES.values())))
    mf = tf.commit_expect(clean, RULES, on_violation="fail")
    assert mf["rows_committed"] == mf["rows_in"] > 0


def test_expect_guards(spark, dirty, tmp_path):
    t = LakeTable(spark, str(tmp_path / "tg"))
    with pytest.raises(ValueError, match=">=1 rule"):
        t.commit_expect(dirty, {})
    with pytest.raises(ValueError, match="reserved"):
        t.commit_expect(dirty, {"_bad": "1=1"})
    with pytest.raises(ValueError, match="on_violation"):
        t.commit_expect(dirty, RULES, on_violation="ignore")
    with pytest.raises(ValueError, match="collide"):
        t.commit_expect(dirty.withColumn("_violations", F.lit(1)),
                        RULES)


def test_streaming_expectations_sink(spark, sf_dir, tmp_path):
    """lake_expect_sink: per micro-batch, valid rows append to the
    table while violators accumulate in the quarantine table — both
    txn-guarded, so a second drain over the same checkpoint commits
    nothing new on EITHER side."""
    from aws_data_pipeline_ads_spark import streaming
    from aws_data_pipeline_ads_spark.lakelog import lake_expect_sink

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text")
    dirty = docs.withColumn(
        "text", F.when(F.col("doc_id") % 7 == 0, F.lit(""))
        .otherwise(F.col("text")))
    land = tmp_path / "landing"
    dirty.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        str(land / "s1"))
    dirty.where(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        str(land / "s2"))
    t = LakeTable(spark, str(tmp_path / "tbl"))
    rules = {"text_nonempty": "length(text) > 0"}
    stream = streaming.documents_stream(spark, str(land),
                                        max_files_per_trigger=1)
    lake_expect_sink(stream, t, str(tmp_path / "ck"), rules)
    q = LakeTable(spark, str(tmp_path / "tbl_quarantine"))
    n_bad = dirty.where(F.length("text") == 0).count()
    assert n_bad > 0
    assert t.read().count() == dirty.count() - n_bad
    assert t.read().where(F.length("text") == 0).count() == 0
    assert q.read().count() == n_bad
    assert q.read().where(
        ~F.array_contains("_violations", "text_nonempty")).count() == 0
    head_t, head_q = t.current_version(), q.current_version()
    # second drain, same checkpoint: nothing new on either table
    stream = streaming.documents_stream(spark, str(land),
                                        max_files_per_trigger=1)
    lake_expect_sink(stream, t, str(tmp_path / "ck"), rules)
    assert (t.current_version(), q.current_version()) == (head_t, head_q)


def test_streaming_expectations_fail_poisons_stream(spark, sf_dir,
                                                    tmp_path):
    """on_violation='fail': a dirty batch errors the query loudly —
    bad rows never commit."""
    from aws_data_pipeline_ads_spark import streaming
    from aws_data_pipeline_ads_spark.lakelog import lake_expect_sink

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text").limit(20)
    dirty = docs.withColumn(
        "text", F.when(F.col("doc_id") % 3 == 0, F.lit(""))
        .otherwise(F.col("text")))
    land = tmp_path / "landing"
    dirty.coalesce(1).write.parquet(str(land / "s1"))
    t = LakeTable(spark, str(tmp_path / "tbl"))
    stream = streaming.documents_stream(spark, str(land))
    with pytest.raises(Exception, match="violate expectations"):
        lake_expect_sink(stream, t, str(tmp_path / "ck"),
                         {"text_nonempty": "length(text) > 0"},
                         on_violation="fail")
    assert t.current_version() is None
