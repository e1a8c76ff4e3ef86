"""The Python-UDF surface (SURVEY.md §2C "UDF surface"): Arrow-batched
pandas UDFs for the cases built-in expressions can't express.

Rule of the house: every hot-path operator in this engine is built-in
expressions (see functions/__init__.py) — these UDFs exist because the
charter requires the full UDF surface AND as the pattern to follow when
a genuinely non-expressible computation appears (custom model scoring,
tokenizers, codecs). Each has a codegen twin in the test suite proving
numerical agreement, so swapping a UDF for the fast path is always
verified.

Why pandas_udf and never F.udf here: row-at-a-time Python UDFs
serialize per row (~10-100× slower); pandas UDFs move Arrow record
batches and amortize the Python boundary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def cosine_to_query_udf(qv: list[float]) -> Column:
    """SCALAR pandas UDF factory: cosine similarity of an array column
    against a fixed query vector, vectorized over the Arrow batch.

    Equivalent to functions.cosine_similarity (codegen) — kept as the
    template for scoring functions that need numpy/BLAS semantics.
    """
    q = np.asarray(qv, dtype=np.float64)
    qn = float(np.linalg.norm(q))

    @F.pandas_udf(T.DoubleType())
    def _cos(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.map(lambda a: np.asarray(a, dtype=np.float64)))
        return pd.Series((m @ q) / (np.linalg.norm(m, axis=1) * qn))

    return _cos


def weighted_mean_udf() -> Column:
    """GROUPED-AGG pandas UDF: sum(v*w)/sum(w) per group — the shape for
    custom aggregates Spark lacks. Used as
    df.groupBy(k).agg(weighted_mean_udf()(F.col('v'), F.col('w')))."""

    @F.pandas_udf(T.DoubleType())
    def _wmean(v: pd.Series, w: pd.Series) -> float:
        return float((v * w).sum() / w.sum())

    return _wmean


ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("label", T.IntegerType()),
        T.StructField("z", T.DoubleType()),
    ]
)


def zscore_per_group(df: DataFrame, group_col: str = "label",
                     id_col: str = "vec_id", value_col: str = "score") -> DataFrame:
    """GROUPED-MAP via applyInPandas: per-group z-score normalization.

    The grouped-map shape (whole group as one pandas frame) is what
    per-group model fitting / rank normalization / learned scoring
    need. State is one group — groups must fit in executor memory, so
    the group key must be finer than any hot key at scale (or pre-salt).
    """

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf[value_col]
        sd = s.std(ddof=0)
        z = (s - s.mean()) / sd if sd > 0 else s * 0.0
        return pd.DataFrame(
            {"vec_id": pdf[id_col], "label": pdf[group_col], "z": z}
        )

    return df.groupBy(group_col).applyInPandas(_z, ZSCORE_SCHEMA)
