"""Differential oracle test: every declared query vs its DuckDB twin at
sf0.001 (the driver runs the same comparison at sf0.01 — SURVEY.md §5.2.1)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from aws_data_pipeline_ads_spark.queries import REGISTRY


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            out[c] = s.astype("bool")
        else:
            out[c] = s.astype("string")
    df = pd.DataFrame(out)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    qd = REGISTRY[name]
    sdf = qd.build(spark, sf_dir).toPandas()
    if qd.oracle is None:
        assert len(sdf) >= 0  # rows-only contract: runs and is well-formed
        return
    ddf = duck.sql(qd.oracle).df()
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert len(sdf) == len(ddf)
    ca, cb = canon(sdf), canon(ddf)
    for col in ca.columns:
        va, vb = ca[col].to_numpy(), cb[col].to_numpy()
        if pd.api.types.is_float_dtype(ca[col]):
            assert np.array_equal(va, vb, equal_nan=True), f"{name}.{col}"
        else:
            assert ((va == vb) | (pd.isna(va) & pd.isna(vb))).all(), f"{name}.{col}"
