"""Per-operator unit tests on small literal DataFrames (SURVEY.md §5.2.2),
including the reference's edge semantics: truncation boundary at 200,
missing-key defaults, guard-on-presence, latest-wins ties."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from aws_data_pipeline_ads_spark import functions as fns
from aws_data_pipeline_ads_spark.operators import dedup, relational, similarity
from aws_data_pipeline_ads_spark.operators.sessionize import sessionize


def test_surrogate_key_shape_and_determinism(spark):
    df = spark.createDataFrame([Row(a=1, b="x"), Row(a=1, b="x"), Row(a=2, b="y")])
    out = df.select(fns.surrogate_key("a", "b", prefix="s").alias("k")).collect()
    assert all(len(r.k) == 12 for r in out)
    assert out[0].k == out[1].k  # content-keyed: same content → same key
    assert out[0].k != out[2].k


def test_truncate_boundary_200(spark):
    # reference: description[:200] (lambda_function.py:280)
    df = spark.createDataFrame([Row(t="x" * 199), Row(t="y" * 200), Row(t="z" * 201)])
    out = df.select(F.length(fns.truncate("t", 200)).alias("n")).collect()
    assert [r.n for r in out] == [199, 200, 200]


def test_cast_default_missing_price(spark):
    # reference: float(record.get('price', 0)) (lambda_function.py:278)
    df = spark.createDataFrame([Row(p="3.5"), Row(p=None)])
    out = df.select(fns.cast_default("p").alias("v")).collect()
    assert [r.v for r in out] == [3.5, 0.0]


def test_full_name_concat(spark):
    df = spark.createDataFrame([Row(f="Ada", l="Lovelace"), Row(f="Solo", l=None)])
    out = df.select(fns.full_name("f", "l").alias("n")).collect()
    # concat_ws skips nulls — matches f-string only when both present;
    # reference defaults missing parts to '' which also yields no dangling space
    assert [r.n for r in out] == ["Ada Lovelace", "Solo"]


def test_latest_by_key_tiebreak(spark):
    rows = [
        Row(k=1, ts=10, id=1, v="a"),
        Row(k=1, ts=20, id=2, v="b"),
        Row(k=1, ts=20, id=3, v="c"),  # ts tie → higher id wins
        Row(k=2, ts=5, id=4, v="d"),
    ]
    out = dedup.latest_by_key(spark.createDataFrame(rows), "k", "ts", "id").collect()
    got = {r.k: r.v for r in out}
    assert got == {1: "c", 2: "d"}


def test_topk_per_group_ties(spark):
    rows = [Row(g=1, v=5.0, id=i) for i in range(5)] + [Row(g=2, v=1.0, id=9)]
    out = relational.topk_per_group(spark.createDataFrame(rows), "g", "v", "id", 2)
    got = sorted((r.g, r.id) for r in out.collect())
    assert got == [(1, 0), (1, 1), (2, 9)]  # equal v → lowest id first


def test_sessionize_gap_edges(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(user_id=1, event_id=1, ts=base),
        Row(user_id=1, event_id=2, ts=base + dt.timedelta(seconds=1800)),  # == gap → same
        Row(user_id=1, event_id=3, ts=base + dt.timedelta(seconds=3601)),  # > gap → new
    ]
    out = sessionize(spark.createDataFrame(rows), gap_seconds=1800).collect()
    sessions = {(r.user_id, r.session_id): r.n_events for r in out}
    assert sessions == {(1, 0): 2, (1, 1): 1}


def test_shingles_short_doc(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b"), Row(doc_id=2, text="a b c d")]
    )
    out = dedup.doc_shingle_sets(df, k=3).collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, set()).add(r.tok)
    assert got[1] == {"a b"}  # shorter than k → whole text
    assert got[2] == {"a b c", "b c d"}


def test_minhash_identical_docs_collide(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, lang="en", text="the quick brown fox jumps over the dog"),
            Row(doc_id=2, lang="en", text="the quick brown fox jumps over the dog"),
            Row(doc_id=3, lang="en", text="completely different words entirely here now"),
        ]
    )
    pairs = {(r.doc_a, r.doc_b) for r in dedup.minhash_lsh_pairs(df).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_served_equals_inline(spark, sf_dir, tmp_path):
    """minhash_write → minhash_lsh_pairs_served is bit-identical to the
    inline pipeline (the index stores the same signatures/bsigs the
    inline path computes), and verified_neardup_pairs with served
    candidates equals the self-contained composition."""
    from aws_data_pipeline_ads_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    idx = str(tmp_path / "mh")
    dedup.minhash_write(docs, idx)

    inline = sorted(map(tuple, dedup.minhash_lsh_pairs(docs).collect()))
    served = sorted(map(tuple,
                        dedup.minhash_lsh_pairs_served(spark, idx).collect()))
    assert served == inline and len(served) > 0

    v_inline = sorted(map(tuple,
                          dedup.verified_neardup_pairs(docs, 0.8).collect()))
    v_served = sorted(map(tuple, dedup.verified_neardup_pairs(
        docs, 0.8,
        cand=dedup.minhash_lsh_pairs_served(spark, idx)).collect()))
    assert v_served == v_inline


def test_bm25_search_unknown_terms_empty(spark, sf_dir, tmp_path):
    """A query for terms absent from the corpus returns zero rows (the
    bucket/term filters prune to nothing) — no crash, no NULL scores."""
    from aws_data_pipeline_ads_spark.catalog import load_table
    from aws_data_pipeline_ads_spark.operators import textstats

    idx = str(tmp_path / "bm")
    textstats.bm25_write(load_table(spark, sf_dir, "documents"), idx)
    out = textstats.bm25_search(
        spark, idx, ["zzzznotaword", "alsonotaword"], k=5).collect()
    assert out == []
    # mixed known/unknown: scoring proceeds on the known term only
    got = textstats.bm25_search(spark, idx, ["vector", "zzzznotaword"], k=5)
    rows = got.collect()
    assert 0 < len(rows) <= 5 and all(r.n_terms_hit == 1 for r in rows)


def test_simhash_served_equals_inline(spark, sf_dir, tmp_path):
    """simhash_write → simhash_pairs_served is bit-identical to the
    inline SQL-template pipeline (fingerprints are pure functions of
    the text)."""
    from aws_data_pipeline_ads_spark.catalog import load_table
    from aws_data_pipeline_ads_spark.operators import simhash as sh

    docs = load_table(spark, sf_dir, "documents")
    idx = str(tmp_path / "sh")
    sh.simhash_write(spark, docs, idx)
    docs.createOrReplaceTempView("__sh_inline_src")
    inline = sorted(map(tuple, spark.sql(
        sh.simhash_pairs_sql("spark", table="__sh_inline_src")).collect()))
    served = sorted(map(tuple, sh.simhash_pairs_served(spark, idx).collect()))
    assert served == inline and len(served) > 0


def test_cosine_matches_python(spark):
    emb = [0.5, -0.25, 0.125]
    qv = [1.0, 2.0, 3.0]
    df = spark.createDataFrame([Row(vec_id=1, embedding=emb)])
    out = similarity.cosine_scores(df, qv).collect()[0]
    dot = sum(a * b for a, b in zip(emb, qv))
    expect = dot / (
        math.sqrt(sum(a * a for a in emb)) * math.sqrt(sum(b * b for b in qv))
    )
    assert abs(out.score - expect) < 1e-12


def test_exact_dedup_counts(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="same"), Row(doc_id=2, text="same"), Row(doc_id=3, text="uniq")]
    )
    out = {r.canonical_doc: r.n_copies for r in dedup.exact_dedup(df).collect()}
    assert out == {1: 2, 3: 1}


def test_ivf_full_probe_equals_brute_force(spark, sf_dir):
    """n_probe == n_centroids degenerates IVF to exact brute force —
    anchors the assignment/probe plumbing to the exact path."""
    from aws_data_pipeline_ads_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qv = similarity.fixed_query_vector()
    exact = [(r.vec_id, r.score) for r in similarity.cosine_topk(emb, qv, 10).collect()]
    full = [
        (r.vec_id, r.score)
        for r in similarity.ivf_topk(emb, qv, 10, n_centroids=8, n_probe=8).collect()
    ]
    assert full == exact


def test_ivf_partial_probe_subset_and_recall(spark, sf_dir):
    """Partial probe returns k rows drawn from the corpus with sane
    recall against the exact top-k (data-dependent, so only a floor)."""
    from aws_data_pipeline_ads_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qv = similarity.fixed_query_vector()
    exact_ids = {r.vec_id for r in similarity.cosine_topk(emb, qv, 10).collect()}
    approx = similarity.ivf_topk(emb, qv, 10, n_centroids=16, n_probe=4).collect()
    assert len(approx) == 10
    recall = len({r.vec_id for r in approx} & exact_ids) / 10
    assert recall >= 0.2, f"IVF recall collapsed: {recall}"


def test_pii_redaction_plants(spark):
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators import textstats

    df = spark.createDataFrame([
        Row(doc_id=1, text="reach me at jane.doe@example.com or 555-123-4567"),
        Row(doc_id=2, text="server at 192.168.1.10 and backup at 10.0.0.1"),
        Row(doc_id=3, text="no personal data here"),
    ])
    out = {r.doc_id: r for r in textstats.redact_pii(df).collect()}
    assert out[1].n_emails == 1 and out[1].n_phones == 1 and out[1].had_pii
    assert "<EMAIL>" in out[1].clean_text and "<PHONE>" in out[1].clean_text
    assert "jane.doe" not in out[1].clean_text
    assert out[2].n_ips == 2 and out[2].clean_text.count("<IP>") == 2
    assert not out[3].had_pii and out[3].clean_text == "no personal data here"


def test_contamination_partitions_corpus(spark, sf_dir):
    """contamination_report + decontaminate partition the corpus: every
    doc is either flagged or kept, flagged docs truly share a shingle
    with the benchmark, and a planted benchmark copy is caught."""
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.catalog import load_table
    from aws_data_pipeline_ads_spark.operators.contamination import (
        contamination_report, decontaminate,
    )

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 101 == 7)
    # plant an exact benchmark copy in the corpus under a fresh id
    leak = bench.limit(1).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text",
        *[c for c in docs.columns if c not in ("doc_id", "text")]
    ).select(*docs.columns)
    corpus = docs.filter(F.col("doc_id") % 101 != 7).unionByName(leak)

    flagged = {r.doc_id for r in contamination_report(corpus, bench).collect()}
    kept = {r.doc_id for r in decontaminate(corpus, bench).collect()}
    all_ids = {r.doc_id for r in corpus.select("doc_id").collect()}
    assert flagged | kept == all_ids and not (flagged & kept)
    assert leak.collect()[0].doc_id in flagged  # planted leak caught


def test_hash_sample_deterministic_and_join_consistent(spark, sf_dir):
    """Hash sampling: stable across re-runs and partitionings, rate near
    nominal, and consistent across tables sharing the key — sampled
    lineitem rows always find their sampled order."""
    from aws_data_pipeline_ads_spark.catalog import load_table
    from aws_data_pipeline_ads_spark.operators.sampling import hash_sample

    orders = load_table(spark, sf_dir, "orders")
    keep = {r.o_orderkey for r in hash_sample(orders, "o_orderkey", 26)
            .select("o_orderkey").collect()}
    again = {r.o_orderkey for r in
             hash_sample(orders.repartition(13), "o_orderkey", 26)
             .select("o_orderkey").collect()}
    assert keep == again  # partitioning-invariant
    n = orders.count()
    assert 0.05 * n <= len(keep) <= 0.16 * n  # ≈ 26/256 ≈ 10%

    li = load_table(spark, sf_dir, "lineitem")
    li_keys = {r.l_orderkey for r in hash_sample(li, "l_orderkey", 26)
               .select("l_orderkey").distinct().collect()}
    # same keyspace, same gate → identical membership decisions: the
    # sampled lineitem keys are exactly the sampled orders present in li
    all_li_keys = {
        r.l_orderkey for r in li.select("l_orderkey").distinct().collect()
    }
    assert li_keys == all_li_keys & keep


def test_repetition_stats_values(spark):
    import pytest

    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators import textstats

    df = spark.createDataFrame([
        Row(doc_id=1, text="a b a c a b"),   # 6 toks, 3 distinct
        Row(doc_id=2, text="unique words only here"),
        Row(doc_id=3, text="spam spam spam spam"),
        Row(doc_id=4, text="single"),
    ])
    out = {r.doc_id: r for r in textstats.repetition_stats(df).collect()}
    assert (out[1].n_tokens, out[1].n_distinct) == (6, 3)
    assert out[1].dup_ratio == pytest.approx(0.5)
    assert out[1].bigram_dup_ratio == pytest.approx(0.2)  # 'a b' twice in 5
    assert out[2].dup_ratio == 0.0 and out[2].repetition_ok
    assert out[3].dup_ratio == pytest.approx(0.75)
    assert not out[3].repetition_ok  # spam page dropped
    assert out[4].n_tokens == 1 and out[4].bigram_dup_ratio == 0.0


def test_lsh_multi_probe_improves_recall(spark):
    """Multi-probe LSH (flip the smallest-margin planes) must dominate
    single-bucket probing: recall@10 is monotonically non-decreasing in
    probes, and full multi-probe over all planes finds at least what
    single-probe does, averaged over several query vectors."""
    import math

    from aws_data_pipeline_ads_spark.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    dim = similarity.EMBED_DIM
    qvs = [[round(math.sin(0.3 * q + i + 1.0), 6) for i in range(dim)]
           for q in range(4)]

    def recall(multi_probe):
        rec = 0.0
        for qv in qvs:
            exact = {r.vec_id for r in similarity.cosine_topk(emb, qv, 10).collect()}
            got = {
                r.vec_id
                for r in similarity.lsh_bucket_topk(
                    emb, qv, 10, multi_probe=multi_probe
                ).collect()
            }
            rec += len(got & exact) / 10
        return rec / len(qvs)

    r0, r2, r4 = recall(0), recall(2), recall(4)
    assert r2 >= r0 and r4 >= r2
    assert r4 > r0  # probing 5 buckets must actually recover neighbors


def test_ivf_lloyd_training_improves_recall(spark):
    """Lloyd's-trained centroids must not lose recall vs raw seeds —
    averaged over several query vectors at sf0.01 (single-query recall
    is too noisy to compare). Also pins list balance: trained lists may
    not be MORE skewed than seed lists (the 100 TB hot-partition risk
    seed-only training carries)."""
    import math

    from aws_data_pipeline_ads_spark.catalog import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    dim = similarity.EMBED_DIM
    qvs = [[round(math.sin(0.3 * q + i + 1.0), 6) for i in range(dim)]
           for q in range(4)]

    def mean_recall(cents):
        rec = 0.0
        for qv in qvs:
            exact = {r.vec_id for r in similarity.cosine_topk(emb, qv, 10).collect()}
            approx = {
                r.vec_id
                for r in similarity.ivf_topk(
                    emb, qv, 10, centroids=cents, n_probe=4
                ).collect()
            }
            rec += len(approx & exact) / 10
        return rec / len(qvs)

    def max_over_mean(cents):
        sizes = [
            r.n
            for r in similarity.ivf_assign(emb, cents)
            .groupBy("list_id").agg(F.count(F.lit(1)).alias("n")).collect()
        ]
        return max(sizes) / (sum(sizes) / len(sizes))

    seeds = similarity.train_centroids(emb, 16, n_iter=0)
    trained = similarity.train_centroids(emb, 16, n_iter=4)
    assert trained != seeds  # training actually moved the centroids
    assert mean_recall(trained) >= mean_recall(seeds)
    assert max_over_mean(trained) <= max_over_mean(seeds) + 0.05


def test_asof_join_union_merge(spark):
    import datetime as dt

    left = spark.createDataFrame([
        Row(k=1, ev=10, ts=dt.datetime(2024, 1, 1, 12, 0)),
        Row(k=1, ev=11, ts=dt.datetime(2024, 1, 3, 12, 0)),
        Row(k=2, ev=20, ts=dt.datetime(2024, 1, 1, 0, 0)),
    ])
    right = spark.createDataFrame([
        Row(k=1, rts=dt.datetime(2024, 1, 1, 12, 0), px=100.0),  # ties left ts → visible
        Row(k=1, rts=dt.datetime(2024, 1, 2, 0, 0), px=200.0),
        Row(k=2, rts=dt.datetime(2024, 1, 5, 0, 0), px=999.0),   # after left → unmatched
    ])
    out = {
        r.ev: r.last_px
        for r in relational.asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts",
            value_col="px", out_col="last_px", left_keep=["ev"],
        ).collect()
    }
    assert out == {10: 100.0, 11: 200.0, 20: None}


def test_pandas_udf_cosine_matches_codegen(spark, sf_dir):
    """The scalar pandas UDF and the built-in expression agree to 1e-9 —
    the verification pattern for swapping UDF ↔ fast path."""
    from aws_data_pipeline_ads_spark.catalog import load_table
    from aws_data_pipeline_ads_spark.functions.udfs import cosine_to_query_udf

    qv = similarity.fixed_query_vector()
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    fast = {r.vec_id: r.score for r in similarity.cosine_scores(emb, qv).collect()}
    udf_scores = {
        r.vec_id: r.score
        for r in emb.select(
            "vec_id", cosine_to_query_udf(qv)(F.col("embedding").cast("array<double>")).alias("score")
        ).collect()
    }
    assert fast.keys() == udf_scores.keys()
    for k in fast:
        assert abs(fast[k] - udf_scores[k]) < 1e-9


def test_grouped_agg_weighted_mean(spark):
    from aws_data_pipeline_ads_spark.functions.udfs import weighted_mean_udf

    df = spark.createDataFrame(
        [Row(k="a", v=1.0, w=1.0), Row(k="a", v=3.0, w=3.0), Row(k="b", v=5.0, w=2.0)]
    )
    out = {
        r.k: r.wm
        for r in df.groupBy("k")
        .agg(weighted_mean_udf()(F.col("v"), F.col("w")).alias("wm"))
        .collect()
    }
    assert abs(out["a"] - 2.5) < 1e-12 and abs(out["b"] - 5.0) < 1e-12


def test_apply_in_pandas_zscore(spark):
    from aws_data_pipeline_ads_spark.functions.udfs import zscore_per_group

    df = spark.createDataFrame(
        [Row(vec_id=1, label=0, score=1.0), Row(vec_id=2, label=0, score=3.0),
         Row(vec_id=3, label=1, score=7.0)]
    )
    out = {r.vec_id: r.z for r in zscore_per_group(df).collect()}
    assert abs(out[1] + 1.0) < 1e-12 and abs(out[2] - 1.0) < 1e-12
    assert out[3] == 0.0  # single-member group → zero, not NaN


def test_verified_neardup_subset_of_exact(spark, sf_dir):
    """LSH-verified pairs have exact precision: every emitted pair also
    appears in the all-pairs exact Jaccard result (same threshold)."""
    from aws_data_pipeline_ads_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    verified = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.verified_neardup_pairs(docs, 0.8).collect()
    }
    # unblocked exact all-pairs reference, computed in plain python
    # (token_jaccard_pairs lang-blocks; the LSH chain doesn't)
    sets = {r.doc_id: set(r.text.split()) for r in docs.collect()}
    exact = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter:
                j = inter / (len(sets[a] | sets[b]))
                if j >= 0.8:
                    exact[(a, b)] = j
    # emitted jaccard is rounded to 6 decimals (oracle canonicalization)
    for pair, j in verified.items():
        assert pair in exact and abs(exact[pair] - j) < 5e-7
    # sanity: near-identical docs must survive the whole chain
    near = spark.createDataFrame([
        Row(doc_id=1, lang="en", text="the quick brown fox jumps over the lazy dog today"),
        Row(doc_id=2, lang="en", text="the quick brown fox jumps over the lazy dog today"),
    ])
    out = dedup.verified_neardup_pairs(near, 0.8).collect()
    assert [(r.doc_a, r.doc_b) for r in out] == [(1, 2)]


def test_text_operators_survive_empty_docs(spark):
    """Real corpora contain empty/whitespace-only docs; under Spark 4's
    default ANSI mode an unguarded ratio division ERRORS the job.
    Every per-doc text operator must emit a row (NULL ratio where
    undefined) instead of crashing."""
    from aws_data_pipeline_ads_spark.operators import textstats

    docs = spark.createDataFrame([
        Row(doc_id=1, lang="en", source="a", text=""),
        Row(doc_id=2, lang="en", source="a", text="   "),
        Row(doc_id=3, lang="en", source="a", text="hello world it is fine "
                                                  "and long enough to pass"),
    ])
    q = {r.doc_id: r for r in textstats.quality_stats(docs).collect()}
    assert q[1].punct_ratio is None and not q[1].quality_ok
    assert q[3].quality_ok
    assert textstats.curate(docs).collect()[0].n_docs == 1  # only doc 3
    r = {r.doc_id: r for r in textstats.repetition_stats(docs).collect()}
    assert r[1].dup_ratio == 0.0
    assert len(dedup.span_dedup_stats(docs).collect()) == 3


def test_correlation_zero_variance_is_null(spark):
    """Constant column → zero variance → correlation undefined: NULL,
    not an ANSI divide-by-zero crash."""
    from aws_data_pipeline_ads_spark.operators.profiling import correlation

    df = spark.createDataFrame(
        [Row(g="a", x=float(i), y=2.0) for i in range(5)]
        + [Row(g="b", x=float(i), y=float(i)) for i in range(5)]
    )
    out = {r.g: r.corr for r in correlation(df, "x", "y", "g").collect()}
    assert out["a"] is None and abs(out["b"] - 1.0) < 1e-9


def test_span_dedup_planted_duplicates(spark):
    """A doc that copies another's passage loses those spans (first
    (doc_id, pos) wins); unique docs score 0; a short doc is its own
    single span."""
    words = [f"w{i}" for i in range(64)]
    fresh = [f"x{i}" for i in range(64)]
    docs = spark.createDataFrame([
        Row(doc_id=1, lang="en", text=" ".join(words)),       # original
        Row(doc_id=2, lang="en", text=" ".join(words)),       # full copy
        Row(doc_id=3, lang="en", text=" ".join(fresh)),       # unique
        Row(doc_id=4, lang="en", text="tiny doc"),            # 1 short span
    ])
    out = {r.doc_id: r for r in dedup.span_dedup_stats(docs).collect()}
    # 64 tokens, span 32, stride 16 → starts 1,17,33 → 3 spans/doc
    assert out[1].n_spans == 3 and out[1].n_dup_spans == 0 and out[1].span_ok
    assert out[2].n_spans == 3 and out[2].n_dup_spans == 3  # every span lost
    assert out[2].dup_fraction == 1.0 and not out[2].span_ok
    assert out[3].n_dup_spans == 0
    assert out[4].n_spans == 1 and out[4].n_dup_spans == 0


def test_token_jaccard_max_df_cap(spark, sf_dir):
    """The df-cap blocking path: identical results when no token exceeds
    the cap, and hot tokens beyond the cap drop out of both the join and
    the set sizes (Jaccard over the capped vocabulary)."""
    from aws_data_pipeline_ads_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    uncapped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.token_jaccard_pairs(docs, 0.8).collect()
    }
    n_docs = docs.count()
    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.token_jaccard_pairs(docs, 0.8, max_df=n_docs).collect()
    }
    assert capped == uncapped  # cap above every df → exact same pairs

    # Planted hot token: "common" is in every doc; with max_df=2 it is
    # excluded, so docs 1/2 (identical except the hot token) still match
    # while docs 3/4 (only the hot token shared) produce no pair.
    hot = spark.createDataFrame([
        Row(doc_id=1, lang="en", text="alpha beta gamma common"),
        Row(doc_id=2, lang="en", text="alpha beta gamma common"),
        Row(doc_id=3, lang="en", text="delta epsilon common"),
        Row(doc_id=4, lang="en", text="zeta eta common"),
    ])
    out = {(r.doc_a, r.doc_b): r.jaccard
           for r in dedup.token_jaccard_pairs(hot, 0.8, max_df=2).collect()}
    assert out == {(1, 2): 1.0}


def test_connected_components_transitive_chain(spark):
    """CC groups a transitive chain (1~2, 2~3) plus an isolated pair and
    a singleton; canonical = min id per component."""
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators import graph

    pairs = spark.createDataFrame([
        Row(doc_a=2, doc_b=3), Row(doc_a=1, doc_b=2),  # chain: {1,2,3}
        Row(doc_a=7, doc_b=5),                          # pair: {5,7}
    ])
    docs = spark.createDataFrame([Row(doc_id=i) for i in (1, 2, 3, 5, 7, 9)])
    out = {r.doc_id: r for r in graph.neardup_clusters(docs, pairs).collect()}
    assert {d: r.cluster_id for d, r in out.items()} == {
        1: 1, 2: 1, 3: 1, 5: 5, 7: 5, 9: 9,
    }
    assert {d: r.cluster_size for d, r in out.items()} == {
        1: 3, 2: 3, 3: 3, 5: 2, 7: 2, 9: 1,
    }
    assert sorted(d for d, r in out.items() if r.keep) == [1, 5, 9]


def test_connected_components_long_chain_converges(spark):
    """A 12-node path graph (worst-case diameter) still converges to one
    component within the iteration cap."""
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators import graph

    pairs = spark.createDataFrame(
        [Row(doc_a=i, doc_b=i + 1) for i in range(1, 12)]
    )
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(1, 13)])
    out = graph.neardup_clusters(docs, pairs).collect()
    assert {r.cluster_id for r in out} == {1}
    assert all(r.cluster_size == 12 for r in out)


def test_line_dedup_first_occurrence_wins(spark):
    """Each normalized sentence survives only at its first (doc_id, pos)
    occurrence corpus-wide; fully-duplicated docs come back empty."""
    from pyspark.sql import Row

    out = {r.doc_id: r for r in dedup.line_dedup(spark.createDataFrame([
        Row(doc_id=1, text="alpha beta. gamma delta. epsilon"),
        Row(doc_id=2, text="gamma delta. zeta eta"),
        Row(doc_id=3, text="Alpha beta. GAMMA DELTA"),  # all dupes (case-norm)
    ])).collect()}
    assert out[1].n_lines == 3 and out[1].n_kept == 3
    assert out[1].clean_text == "alpha beta. gamma delta. epsilon"
    assert out[2].n_lines == 2 and out[2].n_kept == 1
    assert out[2].clean_text == "zeta eta"
    assert out[3].n_lines == 2 and out[3].n_kept == 0
    assert out[3].clean_text == ""


def test_bm25_rare_term_outranks_common(spark):
    """A term unique to one doc must outscore a corpus-wide stopword in
    that doc (idf dominance), and ranks are dense from 1 within a doc."""
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators import textstats

    docs = spark.createDataFrame([
        Row(doc_id=1, text="the quark the the boson"),
        Row(doc_id=2, text="the cat sat"),
        Row(doc_id=3, text="the dog ran"),
    ])
    out = textstats.bm25_terms(docs, top_k=10).collect()
    d1 = {r.term: r for r in out if r.doc_id == 1}
    assert d1["quark"].score > d1["the"].score  # df=1 beats df=3
    assert d1["quark"].df == 1 and d1["the"].df == 3 and d1["the"].tf == 3
    assert sorted(r.term_rank for r in out if r.doc_id == 1) == [1, 2, 3]


def test_bm25_null_text_keeps_n_docs(spark):
    """A NULL-text doc must still count toward n_docs (it coalesces to
    '' and emits one empty-term tf row) — explode of a NULL token array
    would silently drop the doc and shift every idf in the corpus."""
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators import textstats

    schema = "doc_id long, text string"
    with_null = spark.createDataFrame([
        Row(doc_id=1, text="the quark the the boson"),
        Row(doc_id=2, text="the cat sat"),
        Row(doc_id=3, text=None),
    ], schema)
    empty_instead = spark.createDataFrame([
        Row(doc_id=1, text="the quark the the boson"),
        Row(doc_id=2, text="the cat sat"),
        Row(doc_id=3, text=""),
    ], schema)
    got = textstats.bm25_terms(with_null, top_k=10).collect()
    want = textstats.bm25_terms(empty_instead, top_k=10).collect()
    key = lambda r: (r.doc_id, r.term)  # noqa: E731
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # the NULL doc is represented (its single empty token scores), and
    # idf reflects N=3, not a silently-shrunk N=2: for "the" (df=2),
    # idf = (3 - 2 + 0.5) / (2 + 0.5) = 0.6 > 0.
    d3 = [r for r in got if r.doc_id == 3]
    assert len(d3) == 1 and d3[0].term == ""
    d1 = {r.term: r for r in got if r.doc_id == 1}
    assert d1["quark"].score > d1["the"].score > 0


def test_bm25_served_equals_inline(spark, sf_dir, tmp_path):
    """The materialized-vocabulary path (bm25_write → bm25_terms_served)
    is bit-identical to the inline bm25_terms — the index stores only
    integers, every double op happens at query time in the same order.
    bm25_search's top-k agrees with a driver-side recomputation from the
    served per-term scores."""
    from aws_data_pipeline_ads_spark.catalog import load_table
    from aws_data_pipeline_ads_spark.operators import textstats

    docs = load_table(spark, sf_dir, "documents")
    idx = str(tmp_path / "bm25")
    textstats.bm25_write(docs, idx)

    inline = sorted(map(tuple, textstats.bm25_terms(docs, top_k=5).collect()))
    served = sorted(map(tuple,
                        textstats.bm25_terms_served(spark, idx, top_k=5).collect()))
    assert served == inline

    # search: every returned doc's score equals the decimal-folded sum
    # of its query-term scores from the full served table (top_k=high so
    # every term appears), and ordering is (score desc, doc_id asc).
    terms = ["vector", "merge", "scan"]
    hits = textstats.bm25_search(spark, idx, terms, k=10).collect()
    assert hits == sorted(
        hits, key=lambda r: (-r.score, r.doc_id)
    ) and len(hits) == 10
    full = textstats.bm25_terms_served(spark, idx, top_k=10**6).collect()
    from decimal import Decimal

    by_doc: dict[int, list] = {}
    for r in full:
        if r.term in terms:
            by_doc.setdefault(r.doc_id, []).append(r.score)
    for h in hits:
        want = float(sum(Decimal(repr(s)) for s in sorted(by_doc[h.doc_id])))
        assert h.n_terms_hit == len(by_doc[h.doc_id])
        assert abs(h.score - round(want, 6)) < 1e-9, h


def test_tracked_persist_release(spark):
    """Operators register their persisted intermediates; release_caches
    unpersists every one and releasing never changes results (an
    unpersisted frame recomputes from lineage)."""
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators import cache, textstats

    cache.release_caches()
    docs = spark.createDataFrame([
        Row(doc_id=1, text="the quark the the boson"),
        Row(doc_id=2, text="the cat sat"),
    ])
    out = textstats.bm25_terms(docs, top_k=10)
    before = sorted(map(tuple, out.collect()))
    assert cache.live_count() >= 1  # the tf vocabulary stream
    released = cache.release_caches()
    assert released >= 1 and cache.live_count() == 0
    assert sorted(map(tuple, out.collect())) == before  # recompute-correct


def test_top_ngrams_counts_and_rank(spark):
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators import textstats

    docs = spark.createDataFrame([
        Row(doc_id=1, lang="en", text="big cat big cat small dog"),
        Row(doc_id=2, lang="en", text="big cat runs"),
        Row(doc_id=3, lang="de", text="x"),  # single token: no bigrams
    ])
    out = textstats.top_ngrams(docs, k=2).collect()
    en = {r.ngram: r for r in out if r.lang == "en"}
    assert en["big cat"].n_occurrences == 3 and en["big cat"].ngram_rank == 1
    assert len(en) == 2 and all(r.lang == "en" for r in out)


def test_length_outliers_flags_tails(spark):
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators import textstats

    docs = spark.createDataFrame(
        [Row(doc_id=i, lang="en", text="x", n_chars=n)
         for i, n in enumerate([1] + [100] * 20 + [10000])]
    )
    out = {r.doc_id: r for r in textstats.length_outliers(docs).collect()}
    assert out[0].is_outlier and out[21].is_outlier
    assert not any(out[i].is_outlier for i in range(1, 21))


def test_funnel_greedy_order_and_depth(spark):
    """Greedy sequential match: steps must occur in order, strictly
    after the previous match; depth-0 users stay in the output."""
    from datetime import datetime

    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators.funnel import funnel, funnel_summary

    t = lambda m: datetime(2024, 1, 1, 0, m)
    ev = spark.createDataFrame([
        # u1: full funnel, with a decoy purchase BEFORE the click
        Row(user_id=1, event_type="view", ts=t(0)),
        Row(user_id=1, event_type="purchase", ts=t(1)),
        Row(user_id=1, event_type="click", ts=t(2)),
        Row(user_id=1, event_type="purchase", ts=t(3)),
        # u2: click before any view -> depth 1 (view only)
        Row(user_id=2, event_type="click", ts=t(0)),
        Row(user_id=2, event_type="view", ts=t(1)),
        # u3: no funnel steps at all -> depth 0
        Row(user_id=3, event_type="error", ts=t(0)),
    ])
    out = {r.user_id: r for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert out[1].depth == 3 and out[1].step_3_ts.startswith("2024-01-01 00:03")
    assert out[2].depth == 1 and out[2].step_2_ts is None
    assert out[3].depth == 0 and out[3].step_1_ts is None
    s = funnel_summary(funnel(ev, ["view", "click", "purchase"])).first()
    assert (s.n_users, s.reached_1, s.reached_2, s.reached_3) == (3, 2, 1, 1)


def test_cohort_retention_triangle(spark):
    """Users counted once per activity week against their first-week
    cohort; retention never exceeds cohort size."""
    from datetime import datetime

    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators.funnel import cohort_retention

    ev = spark.createDataFrame([
        # u1 cohort week of 2024-01-01 (Mon), active weeks 0 and 1
        Row(user_id=1, ts=datetime(2024, 1, 2)),
        Row(user_id=1, ts=datetime(2024, 1, 3)),   # same week: no dup row
        Row(user_id=1, ts=datetime(2024, 1, 9)),
        # u2 same cohort, week 0 only
        Row(user_id=2, ts=datetime(2024, 1, 4)),
        # u3 next-week cohort
        Row(user_id=3, ts=datetime(2024, 1, 10)),
    ])
    out = {(r.cohort_week, r.week_offset): r.n_users
           for r in cohort_retention(ev).collect()}
    assert out[("2024-01-01", 0)] == 2
    assert out[("2024-01-01", 1)] == 1
    assert out[("2024-01-08", 0)] == 1
    assert len(out) == 3


def test_scd2_versions_and_validity(spark):
    """Consecutive duplicate states collapse; validity windows chain
    contiguously; the last version per key is open-ended."""
    from datetime import datetime

    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators.scd import scd2

    t = lambda m: datetime(2024, 1, 1, 0, m)
    log = spark.createDataFrame([
        Row(user_id=1, event_id=1, event_type="trial", ts=t(0)),
        Row(user_id=1, event_id=2, event_type="trial", ts=t(1)),   # dup run
        Row(user_id=1, event_id=3, event_type="paid", ts=t(2)),
        Row(user_id=1, event_id=4, event_type="churned", ts=t(3)),
        Row(user_id=2, event_id=5, event_type="paid", ts=t(0)),
    ])
    out = scd2(log, "user_id", "ts", "event_type", "event_id").collect()
    u1 = sorted((r for r in out if r.user_id == 1), key=lambda r: r.version)
    assert [r.status for r in u1] == ["trial", "paid", "churned"]
    assert u1[0].effective_to == u1[1].effective_from
    assert u1[2].effective_to is None and u1[2].is_current
    assert not u1[0].is_current and not u1[1].is_current
    u2 = [r for r in out if r.user_id == 2]
    assert len(u2) == 1 and u2[0].is_current and u2[0].version == 1


def test_profile_nulls_distincts_and_native_minmax(spark):
    """Min/max aggregate in the NATIVE type (numeric 9 < 10 despite
    lexicographic '10' < '9'); nulls and distincts exact per column."""
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators.profiling import profile

    df = spark.createDataFrame([
        Row(k=10, s="b"), Row(k=9, s=None), Row(k=10, s="a"),
    ])
    out = {r.col_name: r for r in profile(df).collect()}
    assert out["k"].n_rows == 3 and out["k"].n_nulls == 0
    assert out["k"].n_distinct == 2
    assert out["k"].min_value == "9" and out["k"].max_value == "10"
    assert out["s"].n_nulls == 1 and out["s"].n_distinct == 2
    assert out["s"].min_value == "a" and out["s"].max_value == "b"


def test_hll_sketches_accuracy_and_merge_invariance(spark, sf_dir):
    """(a) HLL estimate within 5% of exact distinct per group; (b) union
    of per-day partial sketches == direct whole-group sketch estimate —
    the re-aggregatability property that makes sketches materializable."""
    from aws_data_pipeline_ads_spark.catalog import load_table
    from aws_data_pipeline_ads_spark.operators.sketches import (
        hll_partial_sketches,
        hll_rollup,
    )

    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    partials = hll_partial_sketches(ev, ["event_type", "day"], "user_id")
    rolled = {r.event_type: r.approx_distinct
              for r in hll_rollup(partials, ["event_type"]).collect()}
    direct = {r.event_type: r.approx_distinct
              for r in hll_rollup(
                  hll_partial_sketches(ev, ["event_type"], "user_id"),
                  ["event_type"]).collect()}
    exact = {r.event_type: r.n
             for r in ev.groupBy("event_type")
             .agg(F.count_distinct("user_id").alias("n")).collect()}
    assert rolled == direct  # merge invariance: exact equality
    for et, n in exact.items():
        assert abs(rolled[et] - n) / n < 0.05, (et, rolled[et], n)


def test_kmv_merge_closure_and_estimator_error(spark):
    """(a) Union-merge closure: merging per-group KMV sketches yields
    EXACTLY the sketch of the whole set (same digests, same ranks) —
    the property that makes KMV a cube-able partial aggregate. (b) The
    distinct estimate (k-1)/U_(k) lands within 4 standard errors
    (4/sqrt(k-2)) of the true cardinality — deterministic given md5,
    so this pins the estimator arithmetic, not a random draw."""
    from aws_data_pipeline_ads_spark.operators.sketches import (
        kmv_distinct,
        kmv_merge,
        kmv_sketch,
    )

    k = 64
    n = 5000
    rows = [(f"g{i % 4}", f"value-{i}") for i in range(n)]
    df = spark.createDataFrame(rows, ["grp", "v"])

    per_group = kmv_sketch(df, ["grp"], "v", k=k)
    merged = {(r.h, r.rn) for r in kmv_merge(per_group, [], k=k).collect()}
    direct_sk = kmv_sketch(df.select("v"), [], "v", k=k)
    direct = {(r.h, r.rn) for r in direct_sk.collect()}
    assert merged == direct and len(direct) == k

    est = kmv_distinct(direct_sk, [], k=k).collect()[0]
    assert est.n_distinct_exact == n
    rel_err = abs(est.est_distinct - n) / n
    assert rel_err < 4.0 / (k - 2) ** 0.5, (est.est_distinct, rel_err)

    # groups smaller than k report the exact count through the same API
    small = kmv_distinct(per_group, ["grp"], k=2048).collect()
    assert all(r.est_distinct == float(r.n_distinct_exact) for r in small)


def test_kmv_jaccard_estimate_tracks_true_overlap(spark):
    """Two sets built with a known 50% overlap: the sketch-only Jaccard
    estimate must land within 4·sqrt(J(1-J)/k) of the truth, and a
    disjoint pair must estimate exactly 0."""
    from aws_data_pipeline_ads_spark.operators.sketches import (
        kmv_sketch,
        kmv_union_jaccard,
    )

    k = 256
    # A = 0..1999, B = 1000..2999 -> |A∩B|=1000, |A∪B|=3000, J=1/3
    rows = [("A", f"v{i}") for i in range(2000)]
    rows += [("B", f"v{i}") for i in range(1000, 3000)]
    rows += [("C", f"w{i}") for i in range(500)]  # disjoint from both
    df = spark.createDataFrame(rows, ["grp", "v"])
    sk = kmv_sketch(df, ["grp"], "v", k=k)
    est = {(r.src_a, r.src_b): r for r in
           kmv_union_jaccard(sk, "grp", k=k).collect()}
    j_ab = est[("A", "B")].est_jaccard
    true_j = 1000.0 / 3000.0
    assert abs(j_ab - true_j) < 4.0 * (true_j * (1 - true_j) / k) ** 0.5
    assert est[("A", "C")].est_jaccard == 0.0
    assert est[("B", "C")].est_jaccard == 0.0
    # C has fewer than k values and is disjoint: its pairs' union size
    # is still capped correctly (k_union <= k, n_both = 0)
    assert est[("A", "C")].n_both == 0


def test_winnow_fingerprint_guarantee_and_density(spark):
    """The winnowing guarantee: two documents sharing a token run of
    length >= w+k-1 share at least one fingerprint digest; exact
    duplicate texts share their ENTIRE fingerprint set; and density
    stays within [1/w, 1] for docs with at least w grams."""
    from aws_data_pipeline_ads_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_pairs,
        winnow_stats,
    )

    k, w = 4, 4
    shared = "alpha beta gamma delta epsilon zeta eta"  # w+k-1 = 7 tokens
    docs = spark.createDataFrame(
        [
            (1, f"one two three {shared} four five six"),
            (2, f"{shared} seven eight nine ten eleven twelve"),
            (3, "completely different words with nothing in common here"),
            (4, "completely different words with nothing in common here"),
            (5, "tiny"),  # shorter than k tokens: one whole-text gram
        ],
        ["doc_id", "text"],
    )
    sets: dict[int, set] = {}
    for r in winnow_fingerprints(docs, k=k, w=w).collect():
        sets.setdefault(r.doc_id, set()).add(r.h)
    assert sets[1] & sets[2], "shared >= w+k-1 run must share a fingerprint"
    assert sets[3] == sets[4], "exact duplicates share the whole set"
    assert len(sets[5]) == 1, "sub-k doc fingerprints its whole text"

    stats = {r.doc_id: r for r in winnow_stats(docs, k=k, w=w).collect()}
    for d in (1, 2, 3, 4):
        assert stats[d].n_grams >= w
        assert 1.0 / w <= stats[d].density <= 1.0
    assert stats[3].min_fp == stats[4].min_fp

    pairs = {(r.doc_a, r.doc_b): r for r in
             winnow_pairs(docs, k=k, w=w, min_shared=1).collect()}
    assert (3, 4) in pairs and pairs[(3, 4)].overlap == 1.0


def test_merge_upsert_update_insert_keep(spark):
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators.upsert import merge_upsert

    target = spark.createDataFrame([
        Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c"),
    ])
    source = spark.createDataFrame([
        Row(k=2, v="B2"),   # update
        Row(k=9, v="new"),  # insert
    ])
    out = {r.k: r.v for r in merge_upsert(target, source, "k").collect()}
    assert out == {1: "a", 2: "B2", 3: "c", 9: "new"}


def test_merge_upsert_rejects_schema_mismatch(spark):
    import pytest
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators.upsert import merge_upsert

    t = spark.createDataFrame([Row(k=1, v="a")])
    s = spark.createDataFrame([Row(k=1, other="x")])
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(t, s, "k")


def test_bpe_tokenizer_splits_like_gpt2_subset(spark):
    """Contractions split off, punctuation runs separate, digits runs
    separate; fertility >= 1 (BPE-ish always >= whitespace words)."""
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators import textstats

    docs = spark.createDataFrame([
        Row(doc_id=1, text="don't stop—it's 2024!!"),
        Row(doc_id=2, text="plain words here"),
    ])
    out = {r.doc_id: r for r in textstats.bpe_token_counts(docs).collect()}
    # don | 't | (space)stop | — | it | 's | (space)2024 | !!
    assert out[1].n_bpe_tokens == 8 and out[1].n_ws_tokens == 3
    assert out[2].n_bpe_tokens == 3 and out[2].fertility == 1.0
    assert out[1].fertility > 2.0


def test_weighted_sample_favors_heavy_rows(spark):
    """Sequential Poisson: heavier rows are sampled more often. With one
    row weighted 1000x vs 999 unit rows, the heavy row lands in a k=100
    sample; sample is deterministic across calls/partitionings."""
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators.sampling import weighted_sample

    rows = [Row(k=i, w=1.0) for i in range(999)] + [Row(k=1_000_000, w=1000.0)]
    df = spark.createDataFrame(rows)
    s1 = {r.k for r in weighted_sample(df, "k", "w", 100).collect()}
    s2 = {r.k for r in weighted_sample(df.repartition(7), "k", "w", 100).collect()}
    assert s1 == s2 and len(s1) == 100
    assert 1_000_000 in s1


def test_prepare_corpus_stage_interactions(spark):
    """The composed prep pipeline: dedup keeps one of identical docs,
    PII is counted, quality gate drops shorts, sampling is a pure
    doc_id gate (partitioning-invariant)."""
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators import textstats

    base = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the field")
    docs = spark.createDataFrame([
        Row(doc_id=1, lang="en", text=base),
        Row(doc_id=2, lang="en", text=base),                   # exact dup
        Row(doc_id=3, lang="en", text="short"),                # gated out
        Row(doc_id=4, lang="de", text=base + " mail me at a@b.com today"),
    ])
    out1 = {r.lang: r for r in
            textstats.prepare_corpus(docs, sample_of_256=256).collect()}
    assert out1["en"].n_docs == 1            # dup collapsed, short gated
    assert out1["de"].n_had_pii == 1
    out2 = {r.lang: r for r in
            textstats.prepare_corpus(docs.repartition(5), 256).collect()}
    assert {k: tuple(v) for k, v in out1.items()} == \
        {k: tuple(v) for k, v in out2.items()}


def test_resample_fill_gaps_and_carry(spark):
    """Empty hours appear with n_events=0 and carry the last non-empty
    hour's sum; spine spans exactly each key's own active range."""
    from datetime import datetime

    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators.timeseries import resample_fill

    ev = spark.createDataFrame([
        Row(user_id=1, ts=datetime(2024, 1, 1, 0, 10), value=2.0),
        Row(user_id=1, ts=datetime(2024, 1, 1, 0, 50), value=3.0),
        # hours 01 and 02 silent
        Row(user_id=1, ts=datetime(2024, 1, 1, 3, 5), value=7.0),
        Row(user_id=2, ts=datetime(2024, 1, 1, 5, 0), value=1.0),
    ])
    out = {(r.user_id, r.bucket): r for r in resample_fill(ev).collect()}
    assert len([k for k in out if k[0] == 1]) == 4  # hours 00..03
    assert len([k for k in out if k[0] == 2]) == 1  # own range only
    h0 = out[(1, "2024-01-01 00:00:00")]
    h1 = out[(1, "2024-01-01 01:00:00")]
    h3 = out[(1, "2024-01-01 03:00:00")]
    assert h0.n_events == 2 and h0.bucket_sum == 5.0
    assert h1.n_events == 0 and h1.bucket_sum is None and h1.filled_sum == 5.0
    assert h3.n_events == 1 and h3.filled_sum == 7.0


def test_hypertable_rollup_levels_consistent(spark):
    """Coarser levels re-aggregated from finer partials equal a direct
    aggregation: month total == sum of day totals == sum of hour
    totals; one raw scan feeds all levels."""
    from datetime import datetime

    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators.timeseries import hypertable_rollup

    ev = spark.createDataFrame([
        Row(event_type="click", ts=datetime(2024, 1, 1, h, 30), value=float(h))
        for h in range(5)
    ] + [Row(event_type="click", ts=datetime(2024, 1, 2, 1, 0), value=100.0)])
    out = hypertable_rollup(ev).collect()
    by_level = {}
    for r in out:
        by_level.setdefault(r.level, []).append(r)
    assert len(by_level["hour"]) == 6
    assert len(by_level["day"]) == 2
    assert len(by_level["month"]) == 1
    month = by_level["month"][0]
    assert month.n_events == 6 and month.total_value == 110.0
    assert sum(r.total_value for r in by_level["day"]) == 110.0


def test_lsh_clusters_refine_exact_clusters(spark, sf_dir):
    """verified pairs ⊆ UNBLOCKED exact all-pairs (the LSH chain is not
    lang-blocked), so every LSH-derived cluster must sit INSIDE one
    exact-pair component — LSH recall can only split clusters, never
    merge docs an exact pass would keep apart."""
    from aws_data_pipeline_ads_spark.catalog import load_table
    from aws_data_pipeline_ads_spark.operators import graph

    docs = load_table(spark, sf_dir, "documents")
    sets = {r.doc_id: set(r.text.split()) for r in docs.collect()}
    parent = {d: d for d in sets}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter and inter / len(sets[a] | sets[b]) >= 0.8:
                parent[find(a)] = find(b)
    exact = {d: find(d) for d in sets}
    lsh = {r.doc_id: r.cluster_id for r in graph.neardup_clusters(
        docs, dedup.verified_neardup_pairs(docs, 0.8)).collect()}
    assert set(lsh) == set(exact)
    spread = {}
    for doc, c in lsh.items():
        spread.setdefault(c, set()).add(exact[doc])
    assert all(len(s) == 1 for s in spread.values())


def test_zorder_constant_column_guard(spark, tmp_path):
    """A constant dimension (span 0) must not divide by zero or corrupt
    the curve for the varying dimension."""
    from pyspark.sql import functions as F

    from aws_data_pipeline_ads_spark.operators.partitioning import zorder_write

    df = spark.range(256).select(
        F.lit(7).alias("x"), F.col("id").alias("y")
    )
    path = str(tmp_path / "zc")
    zorder_write(df, ["x", "y"], path, n_files=4)
    back = spark.read.parquet(path)
    assert back.count() == 256
    assert back.agg(F.count_distinct("x")).first()[0] == 1


def test_chunk_documents_stride_overlap_reconstruction(spark):
    """Chunks stride by chunk-overlap; consecutive chunks share exactly
    `overlap` tokens; short docs yield themselves whole."""
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators import textstats

    toks = [f"w{i}" for i in range(100)]
    docs = spark.createDataFrame([
        Row(doc_id=1, text=" ".join(toks)),
        Row(doc_id=2, text="tiny doc"),
    ])
    out = textstats.chunk_documents(docs, chunk_tokens=10, overlap=2).collect()
    d1 = sorted((r for r in out if r.doc_id == 1), key=lambda r: r.chunk_id)
    # stride 8 over 100 tokens -> ceil((100-2)/8) = 13 chunks
    assert len(d1) == 13
    assert d1[0].chunk_text.split()[:3] == ["w0", "w1", "w2"]
    assert d1[1].chunk_text.split()[0] == "w8"  # stride 8
    assert d1[0].chunk_text.split()[-2:] == d1[1].chunk_text.split()[:2]
    assert all(r.chunk_tokens <= 10 for r in d1)
    d2 = [r for r in out if r.doc_id == 2]
    assert len(d2) == 1 and d2[0].chunk_text == "tiny doc"


def test_histogram_quantiles_accurate_and_mergeable(spark, sf_dir):
    """(a) histogram-interpolated p50/p90 within one bin width of the
    exact percentiles; (b) merging per-half histogram partials gives
    the same estimates as one whole-corpus histogram (mergeability)."""
    from aws_data_pipeline_ads_spark.catalog import load_table
    from aws_data_pipeline_ads_spark.operators.profiling import (
        histogram,
        quantile_from_histogram,
    )

    ev = load_table(spark, sf_dir, "events")
    est = {r.event_type: (r.p50_est, r.p90_est)
           for r in quantile_from_histogram(ev, "value", "event_type").collect()}
    exact = {r.event_type: (r.p50, r.p90)
             for r in ev.groupBy("event_type").agg(
                 F.percentile("value", 0.5).alias("p50"),
                 F.percentile("value", 0.9).alias("p90")).collect()}
    for et, (p50, p90) in exact.items():
        assert abs(est[et][0] - p50) <= 50.0, (et, est[et][0], p50)
        assert abs(est[et][1] - p90) <= 50.0, (et, est[et][1], p90)
    # mergeability: histogram(half1) ∪ histogram(half2) re-aggregated
    # == histogram(all) (exact integer counts)
    h_all = {(r.event_type, r.bin): r.n
             for r in histogram(ev, "value", "event_type").collect()}
    halves = [histogram(ev.filter(F.col("event_id") % 2 == i),
                        "value", "event_type") for i in (0, 1)]
    merged = {}
    for h in halves:
        for r in h.collect():
            merged[(r.event_type, r.bin)] = merged.get((r.event_type, r.bin), 0) + r.n
    assert merged == h_all


def test_incremental_dedup_null_text_not_dropped(spark):
    """Review finding r4: md5(NULL) is NULL and NULL join keys silently
    drop rows — NULL-text docs must stay in the output, hashing as ''."""
    from pyspark.sql import Row

    batch = spark.createDataFrame([
        Row(doc_id=1, text=None),
        Row(doc_id=2, text=""),
        Row(doc_id=3, text="real content here"),
    ], "doc_id long, text string")
    seen = spark.createDataFrame([], "content_hash string")
    out = {r.doc_id: r for r in dedup.incremental_exact_dedup(batch, seen).collect()}
    assert set(out) == {1, 2, 3}
    # NULL and '' share a hash: first (doc 1) keeps, doc 2 is batch_dup
    assert out[1].keep and not out[1].batch_dup
    assert out[2].batch_dup and not out[2].keep
    assert out[3].keep


def test_gopher_rules_values(spark):
    import pytest

    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators import textstats

    # 80 words, >=2 stopwords, mean word length 3.8 (within [3, 10])
    long_ok = "the quick brown fox jumps of and that have with " * 8
    bullets = "- one thing\n- two thing\n* three thing\nplain line"
    ells = "first line...\nsecond…\nthird line\nfourth line"
    df = spark.createDataFrame([
        Row(doc_id=1, text=long_ok.strip()),
        Row(doc_id=2, text=bullets),
        Row(doc_id=3, text=ells),
        Row(doc_id=4, text="### ## # tags # here #"),
        Row(doc_id=5, text="12 34 56 78 90"),
    ])
    out = {r.doc_id: r for r in textstats.gopher_rules(df).collect()}
    # word-count bound: doc 1 has 80 words and >=2 stopwords -> gate ok
    assert out[1].n_words == 80 and bool(out[1].gopher_ok)
    # 3 of 4 lines start with a bullet
    assert out[2].bullet_line_frac == pytest.approx(0.75)
    # 2 of 4 lines end with an ellipsis ('...' and the unicode one)
    assert out[3].ellipsis_line_frac == pytest.approx(0.5)
    # '#' symbols: 8 hash chars over 7 words -> ratio 8/7, gate fails
    assert out[4].hash_word_ratio == pytest.approx(8 / 7, abs=1e-6)
    assert not bool(out[4].gopher_ok)
    # all-numeric words -> alpha fraction 0, gate fails
    assert out[5].alpha_word_frac == pytest.approx(0.0)
    assert not bool(out[5].gopher_ok)


def test_rolling_anomaly_flags_injected_spike(spark):
    import datetime as dt

    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators.timeseries import rolling_anomaly

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for hour in range(40):
        # steady 5 events/hour, except a 50-event spike at hour 30
        n = 50 if hour == 30 else 5 + (hour % 2)  # mild variance -> sd > 0
        for _ in range(n):
            rows.append(Row(ts=base + dt.timedelta(hours=hour), event_type="a"))
            eid += 1
    df = spark.createDataFrame(rows)
    out = {r.bucket: r for r in rolling_anomaly(df).collect()}
    # the spike bucket is the only anomaly
    spike_bucket = (base + dt.timedelta(hours=30)).strftime("%Y-%m-%d %H:%M:%S")
    assert [b for b, r in out.items() if r.is_anomaly] == [spike_bucket]
    # warm-up rows (< 12 trailing points) carry NULL z and no flag
    first = out[base.strftime("%Y-%m-%d %H:%M:%S")]
    assert first.zscore is None and not first.is_anomaly


def test_ewma_matches_pure_python(spark):
    import datetime as dt

    import pytest

    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators.timeseries import ewma_smooth

    base = dt.datetime(2024, 3, 1)
    counts = [3, 1, 4, 1, 5, 9, 2, 6]
    rows = []
    for hour, n in enumerate(counts):
        for _ in range(n):
            rows.append(Row(ts=base + dt.timedelta(hours=hour), event_type="t"))
    df = spark.createDataFrame(rows)
    got = {
        r.bucket: r.ewma
        for r in ewma_smooth(df).collect()
    }
    acc = None
    for hour, n in enumerate(counts):
        acc = float(n) if acc is None else 0.25 * n + 0.75 * acc
        b = (base + dt.timedelta(hours=hour)).strftime("%Y-%m-%d %H:%M:%S")
        assert got[b] == pytest.approx(acc, abs=1e-6)


def test_record_linkage_pairs_and_resolution(spark):
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators.linkage import (
        record_linkage,
        resolve_entities,
    )

    rows = [
        Row(k=1, name="Acme Corp"),
        Row(k=2, name="acme corp"),    # same after normalization
        Row(k=3, name="Acme Corpo"),   # dist 1 from "acme corp"
        Row(k=4, name="Acme Industries"),  # same block, dist > 3
        Row(k=5, name="Zenith Corp"),  # different block entirely
        Row(k=6, name="acme corps"),   # dist 1
    ]
    df = spark.createDataFrame(rows)
    pairs = {(r.name_a, r.name_b): (r.dist, r.n_a, r.n_b)
             for r in record_linkage(df, "k", "name", 3).collect()}
    # normalized "acme corp" has 2 records; pairs stay within the block
    assert pairs[("acme corp", "acme corpo")][0] == 1
    assert pairs[("acme corp", "acme corpo")][1] == 2  # n_a counts both
    assert ("acme corp", "acme industries") not in pairs
    assert all("zenith" not in a and "zenith" not in b for a, b in pairs)

    resolved = {r.k: r.canonical_name
                for r in resolve_entities(df, "k", "name", 3).collect()}
    # the acme-cluster collapses to its lexicographically-smallest name
    assert resolved[1] == resolved[2] == resolved[3] == resolved[6] == "acme corp"
    # no fuzzy neighbor → canonicalize to self
    assert resolved[4] == "acme industries"
    assert resolved[5] == "zenith corp"


def test_pagerank_int_star_graph(spark):
    """On a star graph the hub outranks every leaf; ranks are
    deterministic across runs and mass stays bounded by 1."""
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators.graph import pagerank_int

    nodes = spark.createDataFrame([Row(node=i) for i in range(6)])
    spokes = [Row(src=0, dst=i) for i in range(1, 6)]
    back = [Row(src=i, dst=0) for i in range(1, 6)]
    edges = spark.createDataFrame(spokes + back)
    r = {row.node: row.rank for row in pagerank_int(nodes, edges).collect()}
    assert all(r[0] > r[i] for i in range(1, 6))
    assert len({r[i] for i in range(1, 6)}) == 1  # symmetric leaves tie
    assert 0.9 < sum(r.values()) <= 1.0 + 1e-9
    r2 = {row.node: row.rank for row in pagerank_int(nodes, edges).collect()}
    assert r == r2


def test_triangle_counts_known_graph(spark):
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4} plus a pendant 5: C(4,3)=4 triangles, each K4 node
    # participates in C(3,2)=3, the pendant in none.
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a in range(1, 5) for b in range(a + 1, 5)]
        + [Row(src=4, dst=5)]
    )
    got = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_contamination_overlap_fractions(spark):
    """Graded contamination: full copy → frac 1.0 flagged, half overlap
    → frac in (0,0.7) unflagged, clean doc → 0 hits; every corpus doc
    is emitted (clean docs included) and the integer-arithmetic flag
    cuts exactly at the threshold."""
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators.contamination import (
        contamination_overlap,
    )

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame([
        Row(doc_id=1, text=bench_text),                       # exact copy
        Row(doc_id=2, text="alpha beta gamma delta epsilon "  # shares a prefix
                            "completely different tail words here now"),
        Row(doc_id=3, text="nothing in common with the benchmark at all"),
    ])
    bench = spark.createDataFrame([Row(doc_id=99, text=bench_text)])
    out = {r.doc_id: r for r in
           contamination_overlap(docs, bench, k=5, threshold_pct=70).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].overlap_frac == 1.0 and out[1].flagged
    assert 0 < out[2].overlap_frac < 0.7 and not out[2].flagged
    assert out[3].n_hits == 0 and out[3].overlap_frac == 0.0 and not out[3].flagged
    # the flag is integer-exact at the boundary: n_hits*100 >= n_shingles*70
    for r in out.values():
        assert r.flagged == (r.n_hits * 100 >= r.n_shingles * 70)


def test_epoch_mixture_replicates_deterministically(spark, sf_dir):
    """Epoch-aware mixing: every doc gets ⌊e⌋ or ⌊e⌋+1 copies with
    copy indices 1..n, the realized total is near target_rows, and the
    expansion is a pure function of the key (stable under
    repartitioning)."""
    import math

    from aws_data_pipeline_ads_spark.catalog import load_table
    from aws_data_pipeline_ads_spark.operators.sampling import (
        epoch_mixture_rates, epoch_mixture_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    epochs = {r.source: r.epochs
              for r in epoch_mixture_rates(docs, target_rows=8000).collect()}
    out = epoch_mixture_sample(docs, target_rows=8000).collect()
    per_doc: dict[int, list] = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in per_doc.items():
        e = epochs[rows[0].source]
        assert len(rows) in (math.floor(e), math.floor(e) + 1)
        assert sorted(r.copy for r in rows) == list(range(1, len(rows) + 1))
    total = len(out)
    assert abs(total - 8000) < 0.1 * 8000  # realized ≈ target in expectation
    # determinism: identical multiset under a different partitioning
    out2 = epoch_mixture_sample(docs.repartition(7), target_rows=8000).collect()
    key = lambda r: (r.doc_id, r.copy)
    assert sorted(map(key, out)) == sorted(map(key, out2))


def test_neardup_keep_best_picks_highest_quality(spark):
    """Quality-canonical collapse: the kept member of each near-dup
    cluster is the argmax of the quality column (min-id tiebreak), and
    singletons keep themselves."""
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators.graph import neardup_keep_best

    docs = spark.createDataFrame([
        Row(doc_id=1, n_chars=100),
        Row(doc_id=2, n_chars=300),   # best of cluster {1,2,3}
        Row(doc_id=3, n_chars=300),   # ties with 2 → min id wins (2)
        Row(doc_id=9, n_chars=50),    # singleton
    ])
    pairs = spark.createDataFrame([
        Row(doc_a=1, doc_b=2), Row(doc_a=2, doc_b=3),
    ])
    out = {r.doc_id: r for r in neardup_keep_best(docs, pairs).collect()}
    assert {d for d, r in out.items() if r.keep} == {2, 9}
    assert out[1].cluster_size == 3 and out[9].cluster_size == 1
    assert len({out[d].cluster_id for d in (1, 2, 3)}) == 1


def test_rrf_fuse_semantics(spark):
    """RRF fusion: doc on both lists beats doc on one list at similar
    ranks, each term is 1/(60+rank), and one-list docs get a single
    term with a NULL rank on the absent side."""
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.operators.similarity import rrf_fuse

    sparse = spark.createDataFrame([
        Row(doc_id=1, score=9.0), Row(doc_id=2, score=5.0),
        Row(doc_id=3, score=1.0),
    ])
    dense = spark.createDataFrame([
        Row(doc_id=2, score=0.9), Row(doc_id=4, score=0.8),
    ])
    out = {r.doc_id: r for r in rrf_fuse(sparse, dense, k=10).collect()}
    assert set(out) == {1, 2, 3, 4}
    # doc 2: rank 2 sparse + rank 1 dense
    assert abs(out[2].rrf_score - round(1 / 62 + 1 / 61, 6)) < 1e-9
    assert out[2].sparse_rank == 2 and out[2].dense_rank == 1
    # doc 1: sparse rank 1 only; dense side NULL
    assert abs(out[1].rrf_score - round(1 / 61, 6)) < 1e-9
    assert out[1].dense_rank is None
    # both-lists doc outranks every single-list doc here
    top = max(out.values(), key=lambda r: r.rrf_score)
    assert top.doc_id == 2


def test_curriculum_order_bands_and_determinism(spark, sf_dir):
    """Curriculum ordering: band 1 holds the top quality quartile (its
    min quality >= band 2's max), every (band, shard) is densely
    positioned 1..n, and the whole layout is invariant to input
    partitioning."""
    from aws_data_pipeline_ads_spark.catalog import load_table
    from aws_data_pipeline_ads_spark.operators.sampling import curriculum_order

    docs = load_table(spark, sf_dir, "documents")
    out = curriculum_order(docs).collect()
    assert len(out) == docs.count()
    by_band: dict[int, list] = {}
    for r in out:
        by_band.setdefault(r.band, []).append(r)
    assert set(by_band) <= {1, 2, 3, 4}
    for hi, lo in ((1, 2), (2, 3), (3, 4)):
        if hi in by_band and lo in by_band:
            assert min(r.n_chars for r in by_band[hi]) >= \
                max(r.n_chars for r in by_band[lo])
    shard_pos: dict[tuple, list] = {}
    for r in out:
        shard_pos.setdefault((r.band, r.shard), []).append(r.pos)
    for poss in shard_pos.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    out2 = curriculum_order(docs.repartition(13)).collect()
    key = lambda r: (r.doc_id, r.band, r.shard, r.pos)
    assert sorted(map(key, out)) == sorted(map(key, out2))


def test_key_skew_profile_flags_hot_key_and_avoids_global_sort(spark, sf_dir):
    """The detector behind salted_join/salted_sum_count: the synthesized
    hot key (20% of users collapsed onto id 0, q_skewed_join's setup)
    must be flagged hot and carry ~20% share; uniform keys must not be
    flagged; and the top-k must plan as TakeOrderedAndProject (a
    per-partition k-heap), never a global Sort."""
    from pyspark.sql import functions as F

    from aws_data_pipeline_ads_spark.catalog import load_table
    from aws_data_pipeline_ads_spark.operators.skew import key_skew_profile

    e = load_table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 5 == 0, F.lit(0).cast("long"))
        .otherwise(F.col("user_id"))
        .alias("hot_uid")
    )
    # hot_factor=2 at this fixture scale: sf0.001's key space is only
    # ~13 ids, so the hot key's ratio-to-mean is ~2.5 (at sf0.01+ it is
    # ~24 and the declared query's factor-5 flag fires — driver-gated)
    prof = key_skew_profile(e, ["hot_uid"], top=10, hot_factor=2)
    rows = {r.hot_uid: r for r in prof.collect()}
    assert rows[0].is_hot and rows[0].share > 0.15 and rows[0].skew_ratio > 2
    assert all(not r.is_hot for uid, r in rows.items() if uid != 0)
    assert all(rows[0].cnt >= r.cnt for r in rows.values())

    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_zipf_fit_recovers_known_exponent(spark):
    """Synthetic corpus drawn as an EXACT power law (token i repeated
    ⌊1000/i⌋ times → slope −1): the fit must recover the exponent
    closely and be invariant to input partitioning."""
    from aws_data_pipeline_ads_spark.operators.textstats import zipf_fit

    words = []
    for i in range(1, 101):
        words += [f"tok{i:03d}"] * (1000 // i)
    docs = spark.createDataFrame(
        [(i, " ".join(words[i::10])) for i in range(10)],
        ["doc_id", "text"],
    )
    fit = zipf_fit(docs, top_k=100).collect()[0]
    assert fit.n_tokens == 100
    assert abs(fit.zipf_slope - (-1.0)) < 0.05, fit.zipf_slope
    re_fit = zipf_fit(docs.repartition(7), top_k=100).collect()[0]
    assert (re_fit.zipf_slope, re_fit.zipf_intercept) == (
        fit.zipf_slope, fit.zipf_intercept)


def test_heaps_fit_sublinear_growth_and_invariance(spark, sf_dir):
    """Heaps' β on the fixture corpus is strictly sublinear (0 < β < 1 —
    vocabulary grows, but slower than tokens), ln K is consistent with
    V = K·n^β at the full-corpus point within fit error, and the fit is
    invariant to input partitioning (md5-gate buckets, not row order)."""
    import math

    from aws_data_pipeline_ads_spark.catalog import load_table
    from aws_data_pipeline_ads_spark.operators.textstats import heaps_fit

    # growing corpus: each doc contributes sqrt-ish new vocabulary plus
    # shared filler, so every md5 bucket keeps finding new tokens
    docs = spark.createDataFrame(
        [(i, " ".join([f"w{i}_{j}" for j in range(1 + i % 5)]
                      + ["the", "of", "and"] * 4))
         for i in range(400)],
        ["doc_id", "text"],
    )
    fit = heaps_fit(docs, n_points=8).collect()[0]
    assert fit.n_points == 8
    assert 0.0 < fit.heaps_beta < 1.0, fit.heaps_beta

    from pyspark.sql import functions as F

    toks = docs.select(F.explode(
        F.split(F.trim(F.lower("text")), r"\s+")).alias("t"))
    n, v = toks.agg(F.count("*"), F.countDistinct("t")).collect()[0]
    pred = fit.heaps_lnk + fit.heaps_beta * math.log(n)
    assert abs(pred - math.log(v)) < 1.0  # same order of magnitude

    re_fit = heaps_fit(docs.repartition(13), n_points=8).collect()[0]
    assert (re_fit.heaps_beta, re_fit.heaps_lnk) == (
        fit.heaps_beta, fit.heaps_lnk)

    # the saturation flag: the fixture corpus's ~31-token vocabulary is
    # fully seen in the first bucket → β is exactly 0
    sat = heaps_fit(load_table(spark, sf_dir, "documents"),
                    n_points=8).collect()[0]
    assert sat.heaps_beta == 0.0
