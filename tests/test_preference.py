"""preference_pairs: argmax/argmin determinism, ties, nulls, margins."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from aws_data_pipeline_ads_spark.operators.preference import preference_pairs


def _cands(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, g=g, s=s) for i, g, s in rows],
        "doc_id long, g long, s double")


def test_basic_pairing_and_margin(spark):
    df = _cands(spark, [(1, 10, 5.0), (2, 10, 9.0), (3, 10, 7.0),
                        (4, 20, 1.0), (5, 20, 3.0)])
    got = {r["g"]: r for r in
           preference_pairs(df, "g", F.col("s")).collect()}
    assert (got[10]["chosen_id"], got[10]["rejected_id"]) == (2, 1)
    assert got[10]["margin"] == 4.0
    assert (got[20]["chosen_id"], got[20]["rejected_id"]) == (5, 4)


def test_tie_breaks_prefer_lowest_id_both_sides(spark):
    df = _cands(spark, [(7, 1, 5.0), (3, 1, 5.0), (9, 1, 2.0),
                        (8, 1, 2.0)])
    r = preference_pairs(df, "g", F.col("s")).collect()[0]
    assert r["chosen_id"] == 3      # highest score, lowest id among ties
    assert r["rejected_id"] == 8    # lowest score, lowest id among ties


def test_all_tied_null_and_singleton_groups_drop(spark):
    df = _cands(spark, [
        (1, 1, 4.0), (2, 1, 4.0),     # all tied: argmax == argmin
        (3, 2, 9.0),                  # singleton
        (4, 3, None), (5, 3, None),   # null scores: nothing to rank
        (6, 4, None), (7, 4, 2.0),    # one scored member left: singleton
        (8, 5, 1.0), (9, 5, 6.0),     # real pair
    ])
    got = preference_pairs(df, "g", F.col("s")).collect()
    assert [r["g"] for r in got] == [5]


def test_min_margin_filters(spark):
    df = _cands(spark, [(1, 1, 5.0), (2, 1, 5.5),
                        (3, 2, 1.0), (4, 2, 9.0)])
    got = preference_pairs(df, "g", F.col("s"), min_margin=2.0).collect()
    assert [r["g"] for r in got] == [2]
