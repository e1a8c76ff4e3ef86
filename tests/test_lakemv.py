"""LakeMaterializedView: incremental refresh == full recompute.

The single invariant that matters: after ANY sequence of source
commits (append, CoW delete/update, overwrite), an incrementally
refreshed view is bit-identical — decimal sums included — to a full
GROUP BY recompute over the source head.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aws_data_pipeline_ads_spark.catalog import load_table
from aws_data_pipeline_ads_spark.lakelog import (
    ConditionalPutCommitBackend,
    LakeTable,
)
from aws_data_pipeline_ads_spark.lakemv import LakeMaterializedView


def _rows(df):
    return sorted(
        tuple(r) for r in df.collect()
    )


def _recompute(src_df):
    return src_df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("n_chars").alias("n_n_chars"),
        F.sum(F.col("n_chars").cast("decimal(38,6)")).alias("sum_n_chars"),
    )


@pytest.fixture
def src(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    t = LakeTable(spark, str(tmp_path / "src"))
    t.commit(docs.filter(F.col("doc_id") % 3 < 2)
             .repartitionByRange(8, "doc_id"))
    return t, docs


def _mk_view(spark, t, tmp_path):
    return LakeMaterializedView(
        spark, t, str(tmp_path / "mv"), key="doc_id",
        group_cols=["lang"], measures=["n_chars"])


def test_full_build_matches_recompute(spark, sf_dir, tmp_path, src):
    t, docs = src
    mv = _mk_view(spark, t, tmp_path)
    assert mv.refresh() == 0
    assert _rows(mv.read()) == _rows(_recompute(t.read()))
    assert mv.last_refreshed() == 0


def test_incremental_append_delete_update(spark, sf_dir, tmp_path, src):
    t, docs = src
    mv = _mk_view(spark, t, tmp_path)
    mv.refresh()

    # append the missing third, refresh → matches recompute
    t.commit(docs.filter(F.col("doc_id") % 3 == 2), "append")
    assert mv.refresh() == 1
    assert _rows(mv.read()) == _rows(_recompute(t.read()))

    # CoW range delete
    t.delete({"doc_id": (10, 19)})
    assert mv.refresh() == 2
    assert _rows(mv.read()) == _rows(_recompute(t.read()))

    # CoW update (changed rows contribute -old and +new)
    t.update({"doc_id": (30, 49)}, {"n_chars": F.lit(7)})
    assert mv.refresh() == 3
    assert _rows(mv.read()) == _rows(_recompute(t.read()))

    # several commits between refreshes fold into ONE delta
    t.commit(docs.filter(F.col("doc_id") % 3 == 2)
             .withColumn("doc_id", F.col("doc_id") + 1_000_000), "append")
    t.delete({"doc_id": (0, 5)})
    assert mv.refresh() == 5
    assert _rows(mv.read()) == _rows(_recompute(t.read()))


def test_refresh_is_idempotent_and_txn_guarded(spark, sf_dir, tmp_path, src):
    t, _ = src
    mv = _mk_view(spark, t, tmp_path)
    mv.refresh()
    head = mv.table.current_version()
    assert mv.refresh() == 0                 # up to date: no new commit
    assert mv.table.current_version() == head
    # a crash-replay of the same refresh txn is answered from the log
    assert mv.table.commit(
        mv.read().limit(1), "overwrite", txn_id="mv-refresh:0") == head


def test_all_null_group_sum_returns_to_null(spark, tmp_path):
    """Remove the only non-null measure row of a group: its running
    sum must come back as NULL (SQL SUM over all-nulls), not 0 — the
    per-measure non-null count distinguishes the two."""
    t = LakeTable(spark, str(tmp_path / "src"))
    rows = [Row(doc_id=1, lang="xx", n_chars=10),
            Row(doc_id=2, lang="xx", n_chars=None),
            Row(doc_id=3, lang="yy", n_chars=4)]
    t.commit(spark.createDataFrame(rows, "doc_id long, lang string, "
                                         "n_chars long"))
    mv = _mk_view(spark, t, tmp_path)
    mv.refresh()
    t.delete({"doc_id": (1, 1)})             # xx keeps only the NULL row
    mv.refresh()
    got = {r["lang"]: r for r in mv.read().collect()}
    assert got["xx"]["n_rows"] == 1
    assert got["xx"]["n_n_chars"] == 0
    assert got["xx"]["sum_n_chars"] is None  # NOT 0
    assert float(got["yy"]["sum_n_chars"]) == 4.0
    assert _rows(mv.read()) == _rows(_recompute(t.read()))


def test_group_dropout_and_reappearance(spark, tmp_path):
    """A group whose count hits zero drops out of the state entirely,
    and comes back correct if rows reappear later."""
    t = LakeTable(spark, str(tmp_path / "src"))
    t.commit(spark.createDataFrame(
        [Row(doc_id=1, lang="zz", n_chars=5),
         Row(doc_id=2, lang="ww", n_chars=6)],
        "doc_id long, lang string, n_chars long"))
    mv = _mk_view(spark, t, tmp_path)
    mv.refresh()
    t.delete({"doc_id": (1, 1)})
    mv.refresh()
    assert [r["lang"] for r in mv.read().collect()] == ["ww"]
    t.commit(spark.createDataFrame(
        [Row(doc_id=9, lang="zz", n_chars=11)],
        "doc_id long, lang string, n_chars long"), "append")
    mv.refresh()
    assert _rows(mv.read()) == _rows(_recompute(t.read()))


def test_restore_is_a_forward_delta(spark, sf_dir, tmp_path, src):
    t, docs = src
    mv = _mk_view(spark, t, tmp_path)
    t.commit(docs.filter(F.col("doc_id") % 3 == 2)       # unique keys
             .limit(3), "append")                        # v1
    mv.refresh()
    t.restore(0)                             # head becomes v2...
    mv.refresh()                             # ...which is FORWARD: fine
    assert _rows(mv.read()) == _rows(_recompute(t.read()))


def test_object_store_backend(spark, sf_dir, tmp_path, src):
    """The view state table runs on the conditional-PUT backend like
    any other LakeTable (the seam composes)."""
    t, _ = src
    mv = LakeMaterializedView(
        spark, t, str(tmp_path / "mv"), key="doc_id",
        group_cols=["lang"], measures=["n_chars"],
        backend=ConditionalPutCommitBackend())
    mv.refresh()
    assert _rows(mv.read()) == _rows(_recompute(t.read()))


def test_lake_mv_sink_streaming_refresh(spark, sf_dir, tmp_path):
    """Streaming ingest keeps the view current: every micro-batch is
    one source append + one incremental refresh; a second drain over
    the same checkpoint adds nothing; a source commit that lands
    WITHOUT a refresh (simulated crash between append and refresh) is
    healed by the next refresh."""
    from aws_data_pipeline_ads_spark import streaming
    from aws_data_pipeline_ads_spark.lakemv import lake_mv_sink

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    land = tmp_path / "landing"
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        str(land / "s1"))
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        str(land / "s2"))
    t = LakeTable(spark, str(tmp_path / "src"))
    mv = LakeMaterializedView(
        spark, t, str(tmp_path / "mv"), key="doc_id",
        group_cols=["lang"], measures=["n_chars"])

    stream = streaming.documents_stream(
        spark, str(land), max_files_per_trigger=1
    ).select("doc_id", "lang", "n_chars")
    lake_mv_sink(stream, mv, str(tmp_path / "ck"))
    assert mv.last_refreshed() == t.current_version()
    assert _rows(mv.read()) == _rows(_recompute(t.read()))
    assert _rows(t.read()) == _rows(docs)

    # second drain, same checkpoint: no input → no commits, no refresh
    src_head, mv_head = t.current_version(), mv.table.current_version()
    stream = streaming.documents_stream(
        spark, str(land), max_files_per_trigger=1
    ).select("doc_id", "lang", "n_chars")
    lake_mv_sink(stream, mv, str(tmp_path / "ck"))
    assert (t.current_version(), mv.table.current_version()) \
        == (src_head, mv_head)

    # crash between append and refresh: source moves, view lags...
    t.commit(docs.limit(5).withColumn("doc_id",
                                      F.col("doc_id") + 10_000_000),
             "append")
    assert mv.last_refreshed() < t.current_version()
    # ...and the next refresh (what the next batch would run) heals it
    mv.refresh()
    assert _rows(mv.read()) == _rows(_recompute(t.read()))


def test_delta_distinguishes_null_from_empty_string(spark, tmp_path):
    """ADVICE r8: the change detector must not hash NULL and '' to the
    same bytes — a group flip NULL→'' (or a measure-bearing column
    doing the same) would slip past the delta and silently diverge the
    view from a full recompute."""
    t = LakeTable(spark, str(tmp_path / "src"))
    t.commit(spark.createDataFrame(
        [Row(doc_id=1, lang=None, n_chars=10),
         Row(doc_id=2, lang="", n_chars=3),
         Row(doc_id=3, lang="aa", n_chars=4)],
        "doc_id long, lang string, n_chars long"))
    mv = _mk_view(spark, t, tmp_path)
    mv.refresh()

    def _nrows(df):  # None-safe sort (a NULL group is a legal group)
        return sorted((tuple(r) for r in df.collect()), key=repr)

    # NULL → '' on the group column: same concat_ws bytes, real change
    t.update({"doc_id": (1, 1)}, {"lang": F.lit("")})
    mv.refresh()
    assert _nrows(mv.read()) == _nrows(_recompute(t.read()))
    got = {r["lang"]: r["n_rows"] for r in mv.read().collect()}
    assert got == {"": 2, "aa": 1}  # the NULL group is gone
    # and back: '' → NULL on one of the two '' rows
    t.update({"doc_id": (2, 2)}, {"lang": F.lit(None).cast("string")})
    mv.refresh()
    assert _nrows(mv.read()) == _nrows(_recompute(t.read()))
    # a separator-collision shape on the measure side: values embedding
    # the old '\x1f' separator must not cancel across columns
    t2 = LakeTable(spark, str(tmp_path / "src2"))
    t2.commit(spark.createDataFrame(
        [Row(doc_id=1, lang="x\x1fy", n_chars=None)],
        "doc_id long, lang string, n_chars long"))
    mv2 = LakeMaterializedView(
        spark, t2, str(tmp_path / "mv2"), key="doc_id",
        group_cols=["lang"], measures=["n_chars"])
    mv2.refresh()
    t2.update({"doc_id": (1, 1)},
              {"lang": F.lit("x"), "n_chars": F.lit(121)})
    mv2.refresh()
    assert _rows(mv2.read()) == _rows(
        t2.read().groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("n_chars").alias("n_n_chars"),
            F.sum(F.col("n_chars").cast("decimal(38,6)"))
            .alias("sum_n_chars")))


def _recompute_mm(src_df):
    return src_df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("n_chars").alias("n_n_chars"),
        F.sum(F.col("n_chars").cast("decimal(38,6)")).alias("sum_n_chars"),
        F.min("n_chars").alias("min_n_chars"),
        F.max("n_chars").alias("max_n_chars"),
    )


def test_minmax_deleting_current_extremum(spark, tmp_path):
    """The case signed counts cannot answer: delete a group's current
    MAX row — the new MAX must come from the group's surviving rows
    (delta-scoped partial recompute), and untouched groups must keep
    their stored extrema."""
    t = LakeTable(spark, str(tmp_path / "src"))
    t.commit(spark.createDataFrame(
        [Row(doc_id=1, lang="xx", n_chars=100),   # xx's max
         Row(doc_id=2, lang="xx", n_chars=3),
         Row(doc_id=3, lang="xx", n_chars=7),
         Row(doc_id=4, lang="yy", n_chars=50)],   # untouched group
        "doc_id long, lang string, n_chars long"))
    mv = LakeMaterializedView(
        spark, t, str(tmp_path / "mv"), key="doc_id",
        group_cols=["lang"], measures=["n_chars"], minmax=["n_chars"])
    mv.refresh()
    got = {r["lang"]: r for r in mv.read().collect()}
    assert (got["xx"]["min_n_chars"], got["xx"]["max_n_chars"]) == (3, 100)

    t.delete({"doc_id": (1, 1)})                  # kill xx's max
    mv.refresh()
    got = {r["lang"]: r for r in mv.read().collect()}
    assert (got["xx"]["min_n_chars"], got["xx"]["max_n_chars"]) == (3, 7)
    assert (got["yy"]["min_n_chars"], got["yy"]["max_n_chars"]) == (50, 50)
    assert _rows(mv.read()) == _rows(_recompute_mm(t.read()))

    t.delete({"doc_id": (2, 2)})                  # now kill xx's MIN
    mv.refresh()
    got = {r["lang"]: r for r in mv.read().collect()}
    assert (got["xx"]["min_n_chars"], got["xx"]["max_n_chars"]) == (7, 7)
    assert _rows(mv.read()) == _rows(_recompute_mm(t.read()))


def test_minmax_incremental_matches_recompute(spark, sf_dir, tmp_path, src):
    """Full invariant over append/delete/update with extrema riding
    along: incremental == full recompute, min/max included."""
    t, docs = src
    mv = LakeMaterializedView(
        spark, t, str(tmp_path / "mv"), key="doc_id",
        group_cols=["lang"], measures=["n_chars"], minmax=["n_chars"])
    mv.refresh()
    assert _rows(mv.read()) == _rows(_recompute_mm(t.read()))

    t.commit(docs.filter(F.col("doc_id") % 3 == 2), "append")
    mv.refresh()
    assert _rows(mv.read()) == _rows(_recompute_mm(t.read()))

    # force a new per-group max, then delete exactly those rows — the
    # extremum the view holds is destroyed and must fall back
    t.update({"doc_id": (50, 69)}, {"n_chars": F.lit(999_999)})
    mv.refresh()
    assert _rows(mv.read()) == _rows(_recompute_mm(t.read()))
    assert mv.read().agg(F.max("max_n_chars")).collect()[0][0] == 999_999
    t.delete({"doc_id": (50, 69)})
    mv.refresh()
    assert _rows(mv.read()) == _rows(_recompute_mm(t.read()))
    assert mv.read().agg(F.max("max_n_chars")).collect()[0][0] < 999_999

    # all-NULL group: extrema must be NULL, like a full recompute
    t.commit(spark.createDataFrame(
        [Row(doc_id=10_000_001, lang="nullgrp", n_chars=None)],
        "doc_id long, lang string, n_chars long"), "append")
    mv.refresh()
    got = {r["lang"]: r for r in mv.read().collect()}
    assert got["nullgrp"]["min_n_chars"] is None
    assert got["nullgrp"]["max_n_chars"] is None
    assert _rows(mv.read()) == _rows(_recompute_mm(t.read()))


def test_delta_is_file_pruned(spark, sf_dir, tmp_path):
    """A fixed-size append's refresh must SCAN only the appended files:
    files shared by both versions never open (the 100 TB viability
    property, measured at 10x in SCALE10X.md). A deferred delete that
    lands between the versions changes shared files' effective rows —
    those files must stay in the diff."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    t = LakeTable(spark, str(tmp_path / "src"))
    t.commit(docs.filter(F.col("doc_id") < 400)
             .repartitionByRange(8, "doc_id"))             # v0: 8 files
    mv = _mk_view(spark, t, tmp_path)
    mv.refresh()
    t.commit(docs.filter(F.col("doc_id") >= 400).coalesce(1),
             "append")                                      # v1: +1 file
    old_side, new_side = mv._delta_sides(0, 1)
    assert old_side.inputFiles() == []                      # all common
    new_files = set(new_side.inputFiles())
    assert len(new_files) == 1                              # only the append
    v0 = {f.split("/")[-1] for f in t._read_entry(0)["files"]}
    assert {f.split("/")[-1] for f in new_files}.isdisjoint(v0)
    mv.refresh()
    assert _rows(mv.read()) == _rows(_recompute(t.read()))

    # deferred delete: same file lists, different effective rows — the
    # covered files must NOT be pruned out of the diff
    t.delete({"doc_id": (0, 49)}, defer=True)               # v2
    old_side, new_side = mv._delta_sides(1, 2)
    assert len(old_side.inputFiles()) > 0
    assert len(new_side.inputFiles()) > 0
    mv.refresh()
    assert _rows(mv.read()) == _rows(_recompute(t.read()))


# -- join materialized view ---------------------------------------------------

def _recompute_join(f_df, d_df):
    return (f_df.join(d_df, "lang").groupBy("region").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("n_chars").alias("n_n_chars"),
        F.sum(F.col("n_chars").cast("decimal(38,6)")).alias("sum_n_chars")))


@pytest.fixture
def join_srcs(spark, sf_dir, tmp_path):
    from aws_data_pipeline_ads_spark.lakemv import LakeJoinMaterializedView

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    fact = LakeTable(spark, str(tmp_path / "fact"))
    fact.commit(docs.filter(F.col("doc_id") % 3 < 2)
                .repartitionByRange(8, "doc_id"))
    dim = LakeTable(spark, str(tmp_path / "dim"))
    dim.commit(spark.createDataFrame(
        [Row(lang=lg, region=("apac" if i % 2 else "emea"),
             dim_id=i) for i, lg in enumerate(sorted(langs))],
        "lang string, region string, dim_id long"))
    mv = LakeJoinMaterializedView(
        spark, fact, dim, str(tmp_path / "mvj"), fact_key="doc_id",
        join_key="lang", group_cols=["region"], measures=["n_chars"])
    return fact, dim, mv, docs


def test_join_mv_full_build(spark, join_srcs):
    fact, dim, mv, docs = join_srcs
    assert mv.refresh() == (0, 0)
    assert _rows(mv.read()) == _rows(_recompute_join(fact.read(),
                                                     dim.read()))
    assert mv.last_refreshed() == (0, 0)
    assert mv.refresh() == (0, 0)            # up to date: no new commit


def test_join_mv_fact_revisions(spark, join_srcs):
    fact, dim, mv, docs = join_srcs
    mv.refresh()
    fact.commit(docs.filter(F.col("doc_id") % 3 == 2), "append")
    assert mv.refresh() == (1, 0)
    assert _rows(mv.read()) == _rows(_recompute_join(fact.read(),
                                                     dim.read()))
    fact.delete({"doc_id": (10, 39)})
    fact.update({"doc_id": (50, 69)}, {"n_chars": F.lit(5)})
    assert mv.refresh() == (3, 0)            # two commits, one delta
    assert _rows(mv.read()) == _rows(_recompute_join(fact.read(),
                                                     dim.read()))


def test_join_mv_dim_revision_moves_groups(spark, join_srcs):
    """The F_old ⋈ ΔD path: re-pointing a dim row moves every joined
    fact row's group — signed counts must drain one group and fill the
    other exactly."""
    fact, dim, mv, docs = join_srcs
    mv.refresh()
    first_lang = sorted(
        r["lang"] for r in dim.read().select("lang").collect())[0]
    dim.update({"dim_id": (0, 0)}, {"region": F.lit("moved")})
    assert mv.refresh() == (0, 1)
    assert _rows(mv.read()) == _rows(_recompute_join(fact.read(),
                                                     dim.read()))
    got = {r["region"]: r["n_rows"] for r in mv.read().collect()}
    expect = {r["region"]: r["n_rows"]
              for r in _recompute_join(fact.read(), dim.read()).collect()}
    assert got == expect and "moved" in got
    # a dim DELETE drops the joined rows entirely (inner join)
    dim.delete({"dim_id": (0, 0)})
    assert mv.refresh() == (0, 2)
    assert _rows(mv.read()) == _rows(_recompute_join(fact.read(),
                                                     dim.read()))
    assert "moved" not in {r["region"] for r in mv.read().collect()}
    assert first_lang  # fixture sanity


def test_join_mv_both_sides_one_refresh(spark, join_srcs):
    fact, dim, mv, docs = join_srcs
    mv.refresh()
    fact.commit(docs.filter(F.col("doc_id") % 3 == 2), "append")
    dim.update({"dim_id": (1, 2)}, {"region": F.lit("latam")})
    fact.delete({"doc_id": (0, 25)})
    assert mv.refresh() == (2, 1)
    assert _rows(mv.read()) == _rows(_recompute_join(fact.read(),
                                                     dim.read()))


def test_join_mv_guards(spark, sf_dir, tmp_path):
    from aws_data_pipeline_ads_spark.lakemv import LakeJoinMaterializedView

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    fact = LakeTable(spark, str(tmp_path / "f"))
    fact.commit(docs)
    dim = LakeTable(spark, str(tmp_path / "d"))
    # ambiguous column: n_chars on both sides must refuse
    dim.commit(spark.createDataFrame(
        [Row(lang="aa", region="x", n_chars=1)],
        "lang string, region string, n_chars long"))
    mv = LakeJoinMaterializedView(
        spark, fact, dim, str(tmp_path / "mvj"), fact_key="doc_id",
        join_key="lang", group_cols=["region"], measures=["n_chars"])
    with pytest.raises(ValueError, match="both fact and dim"):
        mv.refresh()
    with pytest.raises(ValueError, match="group"):
        LakeJoinMaterializedView(
            spark, fact, dim, str(tmp_path / "mvj2"), fact_key="doc_id",
            join_key="lang", group_cols=[], measures=["n_chars"])


def test_sumsq_variance_is_exactly_maintained(spark, sf_dir, tmp_path, src):
    """Variance is ALGEBRAIC: sumsq_<m> = Σm² maintained by signed
    deltas must stay bit-identical to a full recompute through
    append/delete/update — and the derived VAR_POP must match
    var_pop() on the head exactly (the square is one IEEE double
    multiply then one decimal rounding on both paths)."""
    t, docs = src
    mv = LakeMaterializedView(
        spark, t, str(tmp_path / "mv"), key="doc_id",
        group_cols=["lang"], measures=["n_chars"], sumsq=["n_chars"])

    def recompute():
        d = F.col("n_chars").cast("double")
        return t.read().groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("n_chars").alias("n_n_chars"),
            F.sum(F.col("n_chars").cast("decimal(38,6)"))
            .alias("sum_n_chars"),
            F.sum((d * d).cast("decimal(38,6)")).alias("sumsq_n_chars"))

    mv.refresh()
    assert _rows(mv.read()) == _rows(recompute())
    t.commit(docs.filter(F.col("doc_id") % 3 == 2), "append")
    t.delete({"doc_id": (10, 39)})
    t.update({"doc_id": (50, 69)}, {"n_chars": F.lit(7)})
    mv.refresh()
    assert _rows(mv.read()) == _rows(recompute())
    # derived VAR_POP from the maintained state == Spark's var_pop
    got = {r["lang"]: (float(r["sumsq_n_chars"]) / r["n_n_chars"]
                       - (float(r["sum_n_chars"]) / r["n_n_chars"]) ** 2)
           for r in mv.read().collect()}
    expect = {r["lang"]: r["v"] for r in t.read().groupBy("lang").agg(
        F.var_pop("n_chars").alias("v")).collect()}
    for lang, v in expect.items():
        assert got[lang] == pytest.approx(v, rel=1e-9), lang
    # sumsq must also be a measure
    with pytest.raises(ValueError, match="sumsq"):
        LakeMaterializedView(
            spark, t, str(tmp_path / "mv2"), key="doc_id",
            group_cols=["lang"], measures=[], sumsq=["n_chars"])


def test_join_mv_minmax_and_sumsq(spark, join_srcs, tmp_path):
    """Join-view extrema via delta-scoped recompute over the CURRENT
    join: deleting the fact rows holding a group's max, and re-pointing
    a dim row (drain+fill), both land on recomputed extrema; sumsq
    rides along signed."""
    from aws_data_pipeline_ads_spark.lakemv import LakeJoinMaterializedView

    fact, dim, _mv, docs = join_srcs

    def recompute():
        d = F.col("n_chars").cast("double")
        return fact.read().join(dim.read(), "lang").groupBy("region").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("n_chars").alias("n_n_chars"),
            F.sum(F.col("n_chars").cast("decimal(38,6)"))
            .alias("sum_n_chars"),
            F.sum((d * d).cast("decimal(38,6)")).alias("sumsq_n_chars"),
            F.min("n_chars").alias("min_n_chars"),
            F.max("n_chars").alias("max_n_chars"))

    mv = LakeJoinMaterializedView(
        spark, fact, dim, str(tmp_path / "mvj_mm"), fact_key="doc_id",
        join_key="lang", group_cols=["region"], measures=["n_chars"],
        minmax=["n_chars"], sumsq=["n_chars"])
    mv.refresh()
    assert _rows(mv.read()) == _rows(recompute())

    # plant a sentinel max then delete exactly those fact rows
    fact.update({"doc_id": (30, 49)}, {"n_chars": F.lit(999_999)})
    mv.refresh()
    assert mv.read().agg(F.max("max_n_chars")).collect()[0][0] == 999_999
    fact.delete({"doc_id": (30, 49)})
    mv.refresh()
    assert _rows(mv.read()) == _rows(recompute())
    assert mv.read().agg(F.max("max_n_chars")).collect()[0][0] < 999_999

    # dim re-pointing drains one region and fills another — extrema on
    # BOTH sides of the move must recompute
    dim.update({"dim_id": (0, 1)}, {"region": F.lit("moved")})
    mv.refresh()
    assert _rows(mv.read()) == _rows(recompute())


def test_refresh_is_compaction_aware(spark, sf_dir, tmp_path):
    """A compaction between refreshes rewrites every file without
    changing rows — the span delta must SKIP it (signed deltas compose
    additively across segments), scanning only the genuinely appended
    files instead of degenerating to a full two-snapshot diff."""
    from aws_data_pipeline_ads_spark.lakemv import signed_span_delta

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    t = LakeTable(spark, str(tmp_path / "src"))
    t.commit(docs.filter(F.col("doc_id") < 300)
             .repartitionByRange(8, "doc_id"))             # v0
    mv = _mk_view(spark, t, tmp_path)
    mv.refresh()
    t.commit(docs.filter((F.col("doc_id") >= 300)
                         & (F.col("doc_id") < 400)).coalesce(1),
             "append")                                      # v1
    assert t.compact(target_bytes=1 << 30) == 2            # v2: rewrite all
    t.commit(docs.filter(F.col("doc_id") >= 400).coalesce(1),
             "append")                                      # v3

    # the span delta reads ONLY the two appended files — the 8 v0
    # files (segment 0→1) and the compacted file (segment 2→3) prune
    d = signed_span_delta(t, "doc_id", ["lang", "n_chars"], 0, 3)
    assert len(d.inputFiles()) == 2
    assert mv.refresh() == 3
    assert _rows(mv.read()) == _rows(_recompute(t.read()))

    # an all-compaction span is a pure bookkeeping refresh
    assert t.compact(target_bytes=1 << 30) == 4
    assert signed_span_delta(t, "doc_id", ["lang", "n_chars"], 3, 4) is None
    assert mv.refresh() == 4
    assert mv.last_refreshed() == 4
    assert _rows(mv.read()) == _rows(_recompute(t.read()))

    # deferred delete then compact (which MATERIALIZES it): the delete
    # segment carries the change, the compact still skips
    t.delete({"doc_id": (0, 49)}, defer=True)               # v5
    assert t.compact(target_bytes=1 << 30) == 6             # v6
    assert mv.refresh() == 6
    assert _rows(mv.read()) == _rows(_recompute(t.read()))


def test_refresh_across_schema_evolution(spark, tmp_path):
    """An evolve-append that widens the source schema must not break
    the view: each version's read resolves columns from the LOG, old
    files read the new column as NULL, and the view's own columns keep
    matching a full recompute."""
    t = LakeTable(spark, str(tmp_path / "src"))
    t.commit(spark.createDataFrame(
        [Row(doc_id=1, lang="aa", n_chars=10),
         Row(doc_id=2, lang="bb", n_chars=4)],
        "doc_id long, lang string, n_chars long"))
    mv = _mk_view(spark, t, tmp_path)
    mv.refresh()
    t.commit(spark.createDataFrame(
        [Row(doc_id=3, lang="aa", n_chars=7, source="crawl")],
        "doc_id long, lang string, n_chars long, source string"),
        "append", evolve=True)
    mv.refresh()
    assert _rows(mv.read()) == _rows(_recompute(
        t.read().select("doc_id", "lang", "n_chars")))


def test_refresh_across_checkpoint_expiry(spark, tmp_path):
    """checkpoint(expire=True) folds per-version entry files into the
    checkpoint — the span walker's _read_entry calls must keep
    resolving through it, or any long-lived view would break the first
    time its source log is checkpointed."""
    t = LakeTable(spark, str(tmp_path / "src"))
    t.commit(spark.createDataFrame(
        [Row(doc_id=1, lang="aa", n_chars=5)],
        "doc_id long, lang string, n_chars long"))
    mv = _mk_view(spark, t, tmp_path)
    mv.refresh()
    t.commit(spark.createDataFrame(
        [Row(doc_id=2, lang="bb", n_chars=7)],
        "doc_id long, lang string, n_chars long"), "append")
    t.commit(spark.createDataFrame(
        [Row(doc_id=3, lang="aa", n_chars=2)],
        "doc_id long, lang string, n_chars long"), "append")
    t.checkpoint(expire=True)
    assert mv.refresh() == 2
    assert _rows(mv.read()) == _rows(_recompute(t.read()))
