"""Rotating tail-query audit at sf0.01 — the judge's round-3 task 8.

The driver hash-verifies only the 50-query window at sf0.01; the other
~80 declared queries are normally exercised at sf0.001 by
test_queries_oracle. This marker re-runs a rotating sample of TAIL
queries through the exact differential harness at the driver's scale
factor, so tail-rot (an sf-sensitive bug that sf0.001 is too small to
expose) is caught each round without running all ~130 queries at sf0.01.

The rotation index derives from the round number (count of
CORRECTNESS_r*.json artifacts in the repo root) — deterministic within
a round, advancing every round so successive rounds cover successive
sample windows. Selected with `pytest -m tail_oracle`; excluded from
the default run via pytest.ini addopts.
"""

from __future__ import annotations

import glob

import pytest

from aws_data_pipeline_ads_spark.catalog import TABLES
from aws_data_pipeline_ads_spark.queries import DRIVER_WINDOW, REGISTRY
from tools.check_oracle import compare

import os

# Override with SPARK_GRAFT_TAIL_SF=/root/testdata/sf0.1 for a
# full-scale rotation pass (slower; the per-round artifact sweep in
# tools/check_oracle.py covers ALL queries at sf0.1 — see
# ORACLE_SF01_r5.txt).
SF01 = os.environ.get("SPARK_GRAFT_TAIL_SF", "/root/testdata/sf0.01")
SAMPLE = 12


def _round_no() -> int:
    return len(glob.glob("/root/repo/CORRECTNESS_r*.json"))


def _sample() -> list[str]:
    tail = list(REGISTRY)[DRIVER_WINDOW:]
    start = (_round_no() * SAMPLE) % len(tail)
    picked = (tail + tail)[start:start + SAMPLE]
    return sorted(set(picked))


@pytest.fixture(scope="module")
def duck01():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF01}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.tail_oracle
@pytest.mark.parametrize("name", _sample())
def test_tail_query_at_sf001(name, spark, duck01):
    qd = REGISTRY[name]
    sdf = qd.build(spark, SF01).toPandas()
    if qd.oracle is None:
        assert len(sdf) >= 0
        return
    ddf = duck01.sql(qd.oracle).df()
    err = compare(sdf, ddf)
    assert err is None, f"{name} @ sf0.01: {err}"
