"""Distributed PCA over an embedding column (covariance method).

The dimensionality-reduction stage a vector pipeline runs before
quantization/ANN (the "O" in OPQ, whitening before SemDeDup, storage
cuts for 100 TB vector lakes). The decomposition itself is tiny — the
covariance of d-dim vectors is d×d (64×64 here) — so the ONLY part
that must distribute is the covariance accumulation, and it is the
classic one-scan tree aggregation:

* **One corpus scan, Arrow-batched partials.** `mapInPandas` computes
  a per-batch partial (count, Σv, flattened Σ v·vᵀ) with one numpy
  `einsum` per batch — a few thousand output ROWS total (one per Arrow
  batch) regardless of corpus size, each 8·(d²+d+1) bytes.
* **Exactly-mergeable.** Partials sum componentwise (groupBy-free
  final agg over ~batch-count rows), then
  cov = Σvvᵀ/n − μμᵀ on the driver. No sampling — the covariance is
  EXACT over the full corpus, unlike the bounded-sample k-means/PQ
  trainers (whose outputs are codebooks, not moments).
* **Deterministic.** numpy `eigh` on the symmetric covariance; each
  eigenvector's sign is canonicalized (largest-|component| entry made
  positive), components round to 9 decimals so the projection
  expressions embed engine-exact literals.
* **Projection is pure codegen.** Each output dimension is one
  `F.aggregate` dot product against a literal array — no Python, no
  shuffle; the projected table is a map-side transform of the scan.

No reference parity: the reference (j-cooper/aws-data-pipeline-ads)
has no vector surface; this implements the charter §2C similarity
family from the standard PCA formulation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_partials(embeddings: DataFrame, vec_col: str) -> tuple:
    """(n, sum_vec, sum_outer) over the FULL corpus: one scan, one
    partial row per Arrow batch, summed driver-side (bounded by batch
    count, not corpus size)."""
    import numpy as np

    row = embeddings.select(vec_col).first()
    if row is None:
        raise ValueError("pca_train: empty embedding table")
    d = len(row[0])
    schema = "n long, s array<double>, g array<double>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            m = np.array([np.asarray(v, np.float64) for v in pdf[vec_col]])
            if not len(m):
                continue
            yield pd.DataFrame({
                "n": [len(m)],
                "s": [m.sum(axis=0).tolist()],
                "g": [np.einsum("ni,nj->ij", m, m).ravel().tolist()],
            })

    rows = embeddings.select(vec_col).mapInPandas(batches, schema).collect()
    n = sum(r.n for r in rows)
    if n == 0:
        raise ValueError("pca_train: empty embedding table")
    s = np.sum([np.array(r.s) for r in rows], axis=0)
    g = np.sum([np.array(r.g).reshape(d, d) for r in rows], axis=0)
    return n, s, g


def pca_train(embeddings: DataFrame, k: int = 16,
              vec_col: str = "embedding") -> dict:
    """Train a k-component PCA: exact full-corpus covariance via the
    one-scan partials above, `eigh` on the driver (d×d — trivially
    bounded), sign-canonicalized components. Returns
    {mean: [d], components: [k][d], explained: [k]} with all values
    rounded to 9 decimals (literal-embedding exact)."""
    import numpy as np

    n, s, g = _gram_partials(embeddings, vec_col)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    explained = []
    for i in order:
        v = vecs[:, i].copy()
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:  # canonical sign: largest-|entry| positive
            v = -v
        comps.append([round(float(x), 9) for x in v])
        explained.append(round(float(max(vals[i], 0.0)), 9))
    return {
        "mean": [round(float(x), 9) for x in mean],
        "components": comps,
        "explained": explained,
    }


def _lit_arr(xs: list[float]):
    return F.array(*[F.lit(float(x)) for x in xs])


def pca_project(embeddings: DataFrame, model: dict, k: int | None = None,
                vec_col: str = "embedding", out_col: str = "pca",
                center: bool = True, round_to: int | None = 6) -> DataFrame:
    """Project each vector onto the first k components: center against
    the literal mean (unless center=False — a PURE ROTATION, which
    preserves norms and dot products and is what OPQ-style quantization
    needs), then one codegen `F.aggregate` dot product per output
    dimension — zero Python, zero shuffle; round_to=6 for cross-run
    stability (None keeps full precision for downstream quantizers)."""
    comps = model["components"][: (k or len(model["components"]))]
    v = F.col(vec_col).cast("array<double>")
    if center:
        v = F.zip_with(v, _lit_arr(model["mean"]), lambda x, m: x - m)
    dims = []
    for c in comps:
        d = F.aggregate(
            F.zip_with(v, _lit_arr(c), lambda x, w: x * w),
            F.lit(0.0), lambda acc, vv: acc + vv,
        )
        dims.append(F.round(d, round_to) if round_to is not None else d)
    return embeddings.withColumn(out_col, F.array(*dims))
