"""Differential oracle test: every declared query vs its DuckDB twin at
sf0.001 (the driver runs the same comparison at sf0.01 — SURVEY.md §5.2.1).

Comparison logic is shared with tools/check_oracle.py so the pytest gate
and the local harness fail the same way the driver does — including the
pre-coercion dtype-class check (int64-vs-float64 drift hashes differently
driver-side even when values agree) and the DESCRIBE-level HUGEINT lint
(DuckDB SUM over ints widens to HUGEINT → pandas float64).
"""

from __future__ import annotations

import pytest

from aws_data_pipeline_ads_spark.queries import REGISTRY
from tools.check_oracle import compare


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    qd = REGISTRY[name]
    sdf = qd.build(spark, sf_dir).toPandas()
    if qd.oracle is None:
        assert len(sdf) >= 0  # rows-only contract: runs and is well-formed
        return
    ddf = duck.sql(qd.oracle).df()
    err = compare(sdf, ddf)
    assert err is None, f"{name}: {err}"


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_has_no_hugeint_output(name, duck):
    qd = REGISTRY[name]
    if qd.oracle is None:
        pytest.skip("rows-only query")
    desc = duck.sql(f"DESCRIBE ({qd.oracle})").fetchall()
    huge = [col for col, typ, *_ in desc if "HUGEINT" in str(typ).upper()]
    assert not huge, (
        f"{name}: oracle columns {huge} are HUGEINT — pandas widens them "
        f"to float64 and the driver hash fails; CAST(... AS BIGINT)"
    )
