"""Embedding similarity queries over `embeddings` (LLM-data ops)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aws_data_pipeline_ads_spark.catalog import load_table
from aws_data_pipeline_ads_spark.operators import similarity
from aws_data_pipeline_ads_spark.queries.registry import query

_QV = similarity.fixed_query_vector()
_QV_SQL = "[" + ", ".join(repr(x) for x in _QV) + "]::DOUBLE[]"
_QNORM = repr(math.sqrt(sum(x * x for x in _QV)))

# Oracle computes the same sequential-fold arithmetic as the Spark
# builder: double dot products over the float32-exact values. Zero-norm
# vectors score NULL (matching cosine_scores' guard) — the unguarded
# 0/0 is NaN, which DuckDB sorts AHEAD of every real score in DESC
# order while Spark's NULL sorts last; the guard plus explicit NULLS
# LAST keeps both engines deterministic if a degenerate vector appears.
_KNN_ORACLE = (
    "WITH scored AS (SELECT vec_id, "
    "CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), "
    "CAST(embedding AS DOUBLE[])) > 0 THEN "
    f"list_dot_product(CAST(embedding AS DOUBLE[]), {_QV_SQL}) / "
    f"(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) * {_QNORM}) "
    "ELSE NULL END AS raw_score FROM embeddings) "
    "SELECT vec_id, round(raw_score, 6) AS score FROM scored "
    "ORDER BY raw_score DESC NULLS LAST, vec_id LIMIT 10"
)

_NEARDUP_ORACLE = (
    "WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb "
    "FROM embeddings) "
    "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
    "round(list_cosine_similarity(a.emb, b.emb), 6) AS score "
    "FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id "
    "WHERE list_cosine_similarity(a.emb, b.emb) >= 0.25"
)


@query(
    "q_embedding_knn",
    oracle=_KNN_ORACLE,
    bench=True,
    doc="2C similarity: brute-force cosine top-k vs a fixed query vector "
        "(TakeOrderedAndProject — linear scan, k-heap per partition)",
)
def q_embedding_knn(spark, sf_dir):
    return similarity.cosine_topk(load_table(spark, sf_dir, "embeddings"), _QV, 10)


@query(
    "q_embedding_neardup",
    oracle=_NEARDUP_ORACLE,
    doc="2C similarity: blocked pairwise cosine near-dup (label blocks); "
        "LSH variant is q_embedding_ann",
)
def q_embedding_neardup(spark, sf_dir):
    return similarity.cosine_neardup_pairs(load_table(spark, sf_dir, "embeddings"), 0.25)


# Materialized ANN indexes per sf_dir: bucket/list assignment is paid
# once at index-build time and every query serves from the pruned
# layout — the production serving shape (inline bucketing costs
# ~n_planes× the arithmetic of the brute scan it is meant to beat;
# measured 2.1s inline vs ~0.3s served at sf0.1). Same answers as the
# inline forms (pytest-pinned). Routing through queries.indexcache
# lets bench.py's per-query subprocess isolation share one build.
from aws_data_pipeline_ads_spark.queries.indexcache import index_path as _index_path


# q_embedding_ann promoted from rows-only to a FULL value-hash oracle
# (r10): "approximate" means approximate w.r.t. brute force, not
# nondeterministic — the hyperplanes are 6-dp literals
# (similarity.hyperplanes), the probe bucket is a Python-computed
# constant (lsh_probe_buckets), and the cosine arithmetic is the same
# sequential-fold double math the q_embedding_knn oracle already
# hash-matches. DuckDB recomputes the bucket assignment per vector and
# the bucket-filtered top-k exactly.
_PLANES_SQL = [
    "[" + ", ".join(repr(x) for x in h) + "]::DOUBLE[]"
    for h in similarity.hyperplanes(8)
]
_QBUCKET = similarity.lsh_probe_buckets(_QV, 8, 0)[0]
_ANN_ORACLE = (
    "WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, ("
    + " + ".join(
        f"CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), {ps}) "
        f">= 0 THEN {1 << p} ELSE 0 END"
        for p, ps in enumerate(_PLANES_SQL)
    )
    + ") AS bucket FROM embeddings), "
    "scored AS (SELECT vec_id, "
    "CASE WHEN list_dot_product(emb, emb) > 0 THEN "
    f"list_dot_product(emb, {_QV_SQL}) / "
    f"(sqrt(list_dot_product(emb, emb)) * {_QNORM}) "
    f"ELSE NULL END AS raw_score FROM b WHERE bucket = {_QBUCKET}) "
    "SELECT vec_id, round(raw_score, 6) AS score FROM scored "
    "ORDER BY raw_score DESC NULLS LAST, vec_id LIMIT 10"
)


@query(
    "q_embedding_ann",
    oracle=_ANN_ORACLE,
    bench=True,
    doc="2C similarity scale path: random-hyperplane LSH served from a "
        "bucket-partitioned index (lsh_write, built once per corpus) — "
        "the probe prunes partitions at plan time instead of "
        "recomputing n_planes dot products per row per query. "
        "Hash-verified end-to-end: the oracle re-derives every "
        "vector's bucket from the same 6-dp plane literals and "
        "replays the bucket-filtered cosine top-k, so a wrong bucket "
        "assignment in the index, a wrong probe, or a scoring drift "
        "all fail the gate",
)
def q_embedding_ann(spark, sf_dir):
    idx = _index_path(
        "lsh", sf_dir,
        lambda p: similarity.lsh_write(load_table(spark, sf_dir, "embeddings"), p),
    )
    return similarity.lsh_topk_pruned(spark, idx, _QV, 10)


# Trained centroids per sf_dir: IVF trains ONCE offline and serves many
# queries; training is deterministic (decimal sums, fixed iterations) so
# memoizing is purely an amortization, not a semantic change. The
# centroids ride along inside the ivf index dir (centroids.json) so
# serving processes that didn't train (bench subprocesses) reload the
# exact trained values instead of re-running Lloyd's.
_CENTROIDS: dict[str, list[list[float]]] = {}


def _ivf_index(spark, sf_dir: str) -> str:
    def build(p: str) -> None:
        import json

        cents = similarity.train_centroids(
            load_table(spark, sf_dir, "embeddings"), 16
        )
        similarity.ivf_write(load_table(spark, sf_dir, "embeddings"), cents, p)
        with open(f"{p}/_centroids.json", "w") as f:
            json.dump(cents, f)

    return _index_path("ivf", sf_dir, build)


def _trained_centroids(spark, sf_dir: str) -> list[list[float]]:
    if sf_dir not in _CENTROIDS:
        import json

        with open(f"{_ivf_index(spark, sf_dir)}/_centroids.json") as f:
            _CENTROIDS[sf_dir] = json.load(f)
    return _CENTROIDS[sf_dir]


@query(
    "q_embedding_ivf",
    oracle=None,  # approximate by construction → rows-only check
    bench=True,
    doc="2C similarity scale path: IVF served from the list_id-"
        "partitioned layout (ivf_write over 16 Lloyd-trained "
        "centroids, built once per corpus); the 4-list probe prunes "
        "unprobed inverted lists at the FILE level",
)
def q_embedding_ivf(spark, sf_dir):
    idx = _ivf_index(spark, sf_dir)
    cents = _trained_centroids(spark, sf_dir)
    return similarity.ivf_topk_pruned(spark, idx, _QV, cents, 10, n_probe=4)


@query(
    "q_embedding_ivf_full",
    # n_probe = n_centroids reads every inverted list → exact brute
    # force, so the plain cosine-top-k SQL is an exact twin. This
    # hash-verifies the IVF SERVING machinery (centroid training,
    # list assignment, partitioned-index read, probe scoring) in the
    # driver window; the pruned 4-probe variant stays rows-only by
    # nature and is pytest-pinned against this one.
    oracle=_KNN_ORACLE,
    doc="2C similarity: IVF at full probe width (n_probe = K = 16) over "
        "the materialized list_id-partitioned index — degenerates to "
        "exact top-k, oracle-verifying the whole serving path",
)
def q_embedding_ivf_full(spark, sf_dir):
    idx = _ivf_index(spark, sf_dir)
    cents = _trained_centroids(spark, sf_dir)
    return similarity.ivf_topk_pruned(spark, idx, _QV, cents, 10, n_probe=16)


def _plane_sql(h: list[float]) -> str:
    return "[" + ", ".join(repr(float(x)) for x in h) + "]::DOUBLE[]"


# Bucket id from literal hyperplanes — the same 8 sign bits the Spark
# side computes (similarity.lsh_bucket_ids), expressed in DuckDB SQL.
_BUCKET_SQL = " + ".join(
    f"(CASE WHEN list_dot_product(emb, {_plane_sql(h)}) >= 0.0 "
    f"THEN {1 << p} ELSE 0 END)"
    for p, h in enumerate(similarity.hyperplanes(8))
)

_SEMDEDUP_ORACLE = (
    "WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb "
    "FROM embeddings), "
    f"b AS (SELECT vec_id, label, emb, {_BUCKET_SQL} AS bucket FROM e) "
    "SELECT a.vec_id, a.label, a.bucket FROM b a "
    "WHERE NOT EXISTS (SELECT 1 FROM b c WHERE c.bucket = a.bucket "
    "AND c.vec_id < a.vec_id "
    "AND list_cosine_similarity(a.emb, c.emb) >= 0.25)"
)


@query(
    "q_semdedup",
    oracle=_SEMDEDUP_ORACLE,
    doc="LLM dedup tier: SemDeDup (cluster, then first-seen-wins drop "
        "of same-cluster cosine near-dups). LSH clustering keeps every "
        "step closed-form so the DuckDB oracle verifies bucket bits, "
        "cosine, and keep rule end-to-end; the k-means variant "
        "(semdedup_keep_kmeans) is pytest-pinned vs numpy.",
)
def q_semdedup(spark, sf_dir):
    return similarity.semdedup_keep(
        load_table(spark, sf_dir, "embeddings"), 0.25
    )


# SQ8: the quantization (max|x|/127 scale, half-up rounding) and the
# integer-cosine shortlist are bit-deterministic, so the oracle runs the
# IDENTICAL two-stage plan — quantize → integer-cosine shortlist →
# exact-cosine rerank — and the final rows match exactly.
_SQ8_ORACLE = (
    "WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, "
    "GREATEST(list_max(list_transform(CAST(embedding AS DOUBLE[]), "
    "x -> abs(x))), 1e-30) / 127.0 AS sc FROM embeddings), "
    "q AS (SELECT vec_id, emb, list_transform(emb, "
    "x -> CAST(floor(x / sc + 0.5) AS BIGINT)) AS qvec FROM s), "
    "qq AS (SELECT list_transform({qv}, "
    "x -> CAST(floor(x / (GREATEST(list_max(list_transform({qv}, "
    "y -> abs(y))), 1e-30) / 127.0) + 0.5) AS BIGINT)) AS v), "
    "short AS (SELECT vec_id, emb FROM q, qq "
    "ORDER BY CASE WHEN list_dot_product(qvec, qvec) > 0 THEN "
    "list_dot_product(qvec, qq.v) / "
    "(sqrt(list_dot_product(qvec, qvec)) * sqrt(list_dot_product(qq.v, qq.v))) "
    "ELSE NULL END DESC NULLS LAST, vec_id LIMIT 40) "
    "SELECT vec_id, round(CASE WHEN list_dot_product(emb, emb) > 0 THEN "
    "list_dot_product(emb, {qv}) / "
    "(sqrt(list_dot_product(emb, emb)) * {qnorm}) ELSE NULL END, 6) AS score "
    "FROM short ORDER BY CASE WHEN list_dot_product(emb, emb) > 0 THEN "
    "list_dot_product(emb, {qv}) / "
    "(sqrt(list_dot_product(emb, emb)) * {qnorm}) ELSE NULL END "
    "DESC NULLS LAST, vec_id LIMIT 10"
).format(qv=_QV_SQL, qnorm=_QNORM)


@query(
    "q_embedding_sq8",
    oracle=_SQ8_ORACLE,
    doc="2C similarity quantized tier: per-vector symmetric int8 "
        "quantization (scales cancel out of cosine → pure integer "
        "shortlist scoring over a 4×-smaller scan) + exact-cosine "
        "rerank probing only shortlist_mult*k full-precision vectors "
        "(similarity.sq8_topk)",
)
def q_embedding_sq8(spark, sf_dir):
    return similarity.sq8_topk(load_table(spark, sf_dir, "embeddings"), _QV, 10)


def warm_indexes(spark, sf_dir: str) -> None:
    """Build the materialized ANN serving artifacts (LSH buckets, IVF
    lists + centroids) for `sf_dir` if absent. Index construction is a
    write-side job — callers that time query serving (bench.py) invoke
    this first so one-time builds don't masquerade as query latency."""
    _index_path(
        "lsh", sf_dir,
        lambda p: similarity.lsh_write(load_table(spark, sf_dir, "embeddings"), p),
    )
    _ivf_index(spark, sf_dir)


_HARDNEG_ORACLE = (
    "WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb "
    "FROM embeddings), "
    f"b AS (SELECT vec_id, label, emb, {_BUCKET_SQL} AS bucket FROM e), "
    "cands AS (SELECT a.vec_id AS anchor, a.label AS anchor_label, "
    "c.vec_id AS negative, "
    "round(list_cosine_similarity(a.emb, c.emb), 6) AS score "
    "FROM b a JOIN b c ON a.bucket = c.bucket AND a.label <> c.label) "
    "SELECT anchor, anchor_label, negative, score, CAST(rank AS INT) AS rank "
    "FROM (SELECT *, row_number() OVER (PARTITION BY anchor "
    "ORDER BY score DESC, negative) AS rank FROM cands) WHERE rank <= 3"
)


@query(
    "q_hard_negatives",
    oracle=_HARDNEG_ORACLE,
    doc="contrastive-training data op: per-anchor top-3 most-similar "
        "DIFFERENT-label vectors, blocked by LSH bucket (the quadratic "
        "is bounded per bucket; n_planes is the scale knob) — every "
        "step closed-form, oracle-verified end-to-end "
        "(similarity.hard_negative_pairs)",
)
def q_hard_negatives(spark, sf_dir):
    return similarity.hard_negative_pairs(
        load_table(spark, sf_dir, "embeddings"), 3
    )


_PQ_BOOKS: dict[str, list] = {}


def _pq_books(spark, sf_dir: str) -> list:
    """Codebooks per sf_dir (training is deterministic, so caching is a
    pure speedup — same bounded-collect posture as _trained_centroids).
    Persisted as books.json through the index cache so serving
    processes reload the trained values instead of retraining."""
    if sf_dir not in _PQ_BOOKS:
        import json

        def build(p: str) -> None:
            books = similarity.pq_train(load_table(spark, sf_dir, "embeddings"))
            with open(f"{p}/books.json", "w") as f:
                json.dump(books, f)

        with open(f"{_index_path('pqbooks', sf_dir, build)}/books.json") as f:
            _PQ_BOOKS[sf_dir] = json.load(f)
    return _PQ_BOOKS[sf_dir]


@query(
    "q_embedding_pq",
    oracle=None,  # approximate by construction → rows-only check;
    # recall + full-shortlist==brute pinned in test_scale_ops
    doc="2C similarity scale path: product quantization (Jégou et al. "
        "2011) — m=8 subspace codebooks trained driver-side on a "
        "bounded deterministic sample, corpus encoded to 8-byte codes "
        "by pure codegen L2-argmin folds, queries scored via ADC "
        "table lookups (no vector math in the scan), exact-cosine "
        "rerank on the broadcast shortlist (similarity.pq_topk)",
)
def q_embedding_pq(spark, sf_dir):
    return similarity.pq_topk(
        load_table(spark, sf_dir, "embeddings"), _QV, 10,
        books=_pq_books(spark, sf_dir),
    )


def _pca_model(spark, sf_dir: str) -> dict:
    """16-component PCA model per corpus (exact full-corpus covariance;
    training is deterministic, so caching through the index cache is
    amortization — serving processes reload the trained json)."""
    import json

    from aws_data_pipeline_ads_spark.operators import pca

    def build(p: str) -> None:
        model = pca.pca_train(load_table(spark, sf_dir, "embeddings"), k=16)
        with open(f"{p}/model.json", "w") as f:
            json.dump(model, f)

    with open(f"{_index_path('pcamodel', sf_dir, build)}/model.json") as f:
        return json.load(f)


_PCA_K = 8


@query(
    "q_embedding_pca",
    # Promoted to an invariants hash oracle (r11, the
    # q_unigram_tok_vocab move): the eigendecomposition itself has no
    # SQL twin AND the trained literals differ per sf_dir (a static
    # oracle string cannot embed them), but the CONTRACTS that make a
    # PCA a PCA are data-anchored and engine-replayable —
    # * exact corpus moments (count, Σx, Σx² in decimal) anchor the
    #   data read on both engines;
    # * the projected-variance identity Σ‖proj‖²/n == Σ explainedⱼ
    #   ties the DISTRIBUTED projection (codegen fold over component
    #   literals) to the driver-side eigenvalues — a wrong component
    #   literal, a centering slip, or a covariance bug all break it;
    # * mean-zero projections pin the model mean to the data mean;
    # * orthonormality + descending explained pin the decomposition.
    # The full per-vector projection stays numpy-equality-pinned in
    # tests/test_pca.py.
    oracle=(
        "WITH flat AS (SELECT unnest(CAST(embedding AS DOUBLE[])) AS v "
        "FROM embeddings) "
        "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings) "
        "AS n_vecs, "
        "CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE) AS sum_val_all, "
        "CAST(SUM(CAST(v*v AS DECIMAL(38,6))) AS DOUBLE) AS sum_sq_all, "
        "TRUE AS mean0_ok, TRUE AS projvar_ok, "
        "TRUE AS orthonormal_ok, TRUE AS explained_desc_ok "
        "FROM flat"
    ),
    doc="2C similarity: distributed PCA — EXACT full-corpus covariance "
        "via one Arrow-batched scan (a partial Gram row per batch, "
        "componentwise-mergeable), driver-side eigh on the 64x64 "
        "matrix, sign-canonicalized components embedded as literals, "
        "projection as pure codegen aggregate dot products (zero "
        "Python, zero shuffle). The dim-reduction/whitening stage a "
        "vector lake runs before PQ/ANN (operators/pca.py). "
        "Hash-gated since r11 on exact corpus moments + the projected-"
        "variance≡eigenvalue identity computed over the distributed "
        "projection (see oracle comment); per-vector projections stay "
        "numpy-equality-pinned in tests/test_pca.py",
)
def q_embedding_pca(spark, sf_dir):
    from aws_data_pipeline_ads_spark.operators import pca

    model = _pca_model(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    # exact data anchors, replayed by the oracle in the same decimal
    flat = emb.select(
        F.explode(F.col("embedding").cast("array<double>")).alias("v"))
    dec = "decimal(38,6)"
    anchors = flat.agg(
        (F.count("v") / F.lit(len(model["mean"])))
        .cast("long").alias("n_vecs"),
        F.sum(F.col("v").cast(dec)).cast("double").alias("sum_val_all"),
        F.sum((F.col("v") * F.col("v")).cast(dec))
        .cast("double").alias("sum_sq_all"))
    # distributed projection stats → the variance identity booleans
    proj = pca.pca_project(emb, model, k=_PCA_K, round_to=None)
    cols = [F.element_at("pca", j + 1).alias(f"p{j}")
            for j in range(_PCA_K)]
    pagg = proj.select(*cols).agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(f"p{j}").alias(f"s{j}") for j in range(_PCA_K)],
        *[F.sum(F.col(f"p{j}") * F.col(f"p{j}")).alias(f"q{j}")
          for j in range(_PCA_K)])
    mean0 = None
    projvar = None
    for j in range(_PCA_K):
        m_ok = F.abs(F.col(f"s{j}") / F.col("n")) < 1e-4
        ev = float(model["explained"][j])
        v_ok = (F.abs(F.col(f"q{j}") / F.col("n") - F.lit(ev))
                < F.lit(max(1e-6 * max(ev, 0.0), 1e-9)))
        mean0 = m_ok if mean0 is None else (mean0 & m_ok)
        projvar = v_ok if projvar is None else (projvar & v_ok)
    # ONE bounded row (two booleans) — collected instead of
    # cross-joined so the declared plan stays free of nested-loop
    # joins (tests/test_plans.py gates those); same bounded-driver
    # posture as the model training itself
    crow = pagg.select(mean0.alias("mean0_ok"),
                       projvar.alias("projvar_ok")).collect()[0]
    # model-side contracts (bounded: k×d literals, checked driver-side)
    comps = model["components"]
    dots = [
        sum(a * b for a, b in zip(comps[i], comps[j]))
        for i in range(len(comps)) for j in range(i, len(comps))
    ]
    ortho = all(
        abs(d - (1.0 if i == j else 0.0)) < 1e-6
        for (i, j), d in zip(
            [(i, j) for i in range(len(comps))
             for j in range(i, len(comps))], dots)
    )
    desc = all(a >= b - 1e-12 for a, b in
               zip(model["explained"], model["explained"][1:]))
    return anchors.select(
        "n_vecs", "sum_val_all", "sum_sq_all",
        F.lit(bool(crow["mean0_ok"])).alias("mean0_ok"),
        F.lit(bool(crow["projvar_ok"])).alias("projvar_ok"),
        F.lit(bool(ortho)).alias("orthonormal_ok"),
        F.lit(bool(desc)).alias("explained_desc_ok"))


_IVFPQ_RES_BOOKS: dict = {}


def _ivfpq_res_books(spark, sf_dir: str) -> list:
    """RESIDUAL codebooks per sf_dir (trained on û − c[list], the
    FAISS IVFADC shape) — same cache posture as _pq_books."""
    if sf_dir not in _IVFPQ_RES_BOOKS:
        import json

        def build(p: str) -> None:
            books = similarity.ivfpq_train_residual(
                load_table(spark, sf_dir, "embeddings"),
                _trained_centroids(spark, sf_dir))
            with open(f"{p}/books.json", "w") as f:
                json.dump(books, f)

        with open(f"{_index_path('ivfpqresbooks', sf_dir, build)}"
                  f"/books.json") as f:
            _IVFPQ_RES_BOOKS[sf_dir] = json.load(f)
    return _IVFPQ_RES_BOOKS[sf_dir]


@query(
    "q_embedding_ivfpq",
    oracle=None,  # approximate by construction → rows-only check;
    # residual-MSE<raw-MSE + covering-shortlist==brute +
    # PartitionFilters + recall pytest-pinned
    doc="2C similarity scale path: the FAISS IVFADC composite — PQ "
        "codes of the RESIDUAL û − c[list] partitioned by IVF list "
        "(ivfpq_write residual=True, built once per corpus; residual "
        "codebooks from ivfpq_train_residual reconstruct strictly "
        "better than raw-vector codes at equal m/n_codes). A 3-probe "
        "query reads 3/8 of the 8-byte-per-vector codes table at the "
        "file level and ranks by dot(q̂,c[list]) — a K-entry literal "
        "lookup on the partition column — plus m residual-table ADC "
        "lookups (zero vector math in the scan); exact-cosine reranks "
        "the broadcast shortlist (similarity.ivfpq_topk)",
)
def q_embedding_ivfpq(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = _trained_centroids(spark, sf_dir)
    idx = _index_path(
        "ivfpq_res", sf_dir,
        lambda p: similarity.ivfpq_write(
            emb, centroids, _ivfpq_res_books(spark, sf_dir), p,
            residual=True
        ),
    )
    return similarity.ivfpq_topk(spark, idx, emb, _QV, centroids, 10, n_probe=3)


def _opq_model(spark, sf_dir: str) -> dict:
    """Trained OPQ model per corpus (rotation + books json through the
    index cache — training is deterministic, reload beats retrain)."""
    import json

    def build(p: str) -> None:
        model = similarity.opq_train(load_table(spark, sf_dir, "embeddings"))
        with open(f"{p}/opq.json", "w") as f:
            json.dump(model, f)

    with open(f"{_index_path('opq', sf_dir, build)}/opq.json") as f:
        return json.load(f)


@query(
    "q_embedding_opq",
    oracle=None,  # approximate by construction → rows-only check;
    # recall floor + full-shortlist==brute + training determinism
    # pinned in test_scale_ops (the rotation is orthonormal and
    # uncentered, so the exact rerank is bit-identical to brute force)
    doc="2C similarity scale path: OPQ (Ge et al. 2013) — PCA-"
        "initialized rotation with eigenvalue allocation balancing "
        "variance across the m subspaces, refined by alternating "
        "Gauss-Seidel rounds (train books → Procrustes re-estimate) "
        "driver-side on the same bounded sample pq_train uses; corpus "
        "rotated by pure codegen dot products, ADC shortlist, exact "
        "rerank on ORIGINAL vectors (similarity.opq_topk)",
)
def q_embedding_opq(spark, sf_dir):
    return similarity.opq_topk(
        load_table(spark, sf_dir, "embeddings"), _QV, 10,
        opq=_opq_model(spark, sf_dir),
    )
