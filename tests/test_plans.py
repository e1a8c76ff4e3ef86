"""Plan-shape tests: assert the physical plans we'd want at 100 TB
(pushdown, pruning, broadcast for bounded dims, take-ordered top-k).
These fail if a refactor silently degrades the plan even when rows
stay correct."""

from __future__ import annotations

from aws_data_pipeline_ads_spark import plans
from aws_data_pipeline_ads_spark.queries import REGISTRY


def _q(name, spark, sf_dir):
    return REGISTRY[name].build(spark, sf_dir)


def test_status_filter_pushed_to_scan(spark, sf_dir):
    df = _q("q_status_filter", spark, sf_dir)
    assert plans.has_pushed_filters(df, "o_orderstatus")


def test_projection_prunes_columns(spark, sf_dir):
    df = _q("q_scan_project", spark, sf_dir)
    cols = set(plans.read_schema_columns(df))
    assert cols == {"o_orderkey", "o_custkey", "o_totalprice"}  # not the full table


def test_tpch_q1_prunes_and_pushes(spark, sf_dir):
    df = _q("q_tpch_q1", spark, sf_dir)
    assert plans.has_pushed_filters(df, "l_shipdate")
    assert "l_orderkey" not in plans.read_schema_columns(df)  # unused key pruned


def test_star_join_broadcasts_bounded_dims(spark, sf_dir):
    df = _q("q_join_star", spark, sf_dir)
    assert plans.uses_broadcast_join(df)  # nation/region must broadcast


def test_limit_topk_uses_take_ordered(spark, sf_dir):
    df = _q("q_limit_topk", spark, sf_dir)
    assert plans.uses_take_ordered(df)  # never a global sort


def test_embedding_knn_uses_take_ordered(spark, sf_dir):
    df = _q("q_embedding_knn", spark, sf_dir)
    assert plans.uses_take_ordered(df)


def test_session_gap_single_shuffle_for_both_windows(spark, sf_dir):
    # lag + cumulative sum share the (user_id) partitioning — Catalyst
    # must plan ONE exchange, not two.
    df = _q("q_session_gap", spark, sf_dir)
    assert plans.count_shuffles(df) <= 2  # 1 window exchange + 1 final agg


def test_scan_queries_stay_in_codegen(spark, sf_dir):
    df = _q("q_quality_score", spark, sf_dir)
    assert plans.wholestage_codegen_spans(df) >= 1
    assert "BatchEvalPython" not in plans.physical_plan(df)  # no row-UDFs


def test_asof_join_bounded_shuffles(spark, sf_dir):
    """Union-merge as-of: dedup groupBy + window partitioning — two
    shuffles, never a per-key self-join explosion."""
    df = _q("q_asof_join", spark, sf_dir)
    assert plans.count_shuffle_exchanges(df) <= 2


def test_curation_pipeline_broadcasts_canon(spark, sf_dir):
    """The canonical-doc_id side is aggregate-reduced; the join back must
    be broadcast (or AQE-converted), not a full sort-merge shuffle."""
    df = _q("q_curation_pipeline", spark, sf_dir)
    assert plans.uses_broadcast_join(df)
    assert plans.count_shuffle_exchanges(df) <= 2


def test_scalar_censuses_are_shuffle_free(spark, sf_dir):
    for name in ("q_math_funcs", "q_json_typed", "q_string_funcs"):
        assert plans.count_shuffle_exchanges(_q(name, spark, sf_dir)) == 0


def test_tpch_q3_bucketed_is_shuffle_free(spark, sf_dir):
    """The bucketed-fact Q3: orders⋈lineitem reuses the bucket
    partitioning (no Exchange, and the bucket sort feeds the SMJ), the
    customer side broadcasts, and the per-orderkey aggregation also
    reuses the partitioning — ZERO shuffle exchanges in the whole plan.
    The vanilla q_tpch_q3 plan on the same data carries the fact-join
    exchanges this bucketing amortizes away."""
    # Disable size-based broadcast so test-scale data takes the path
    # 100 TB facts would: the fact⋈fact join must survive as a bucket-
    # co-located SMJ (the explicit F.broadcast hint on the customer dim
    # is unaffected by the threshold).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = _q("q_tpch_q3_bucketed", spark, sf_dir)
        assert plans.count_shuffle_exchanges(df) == 0
        assert plans.uses_sort_merge_or_shuffled_hash(df)  # the fact leg
        assert plans.uses_broadcast_join(df)  # hinted dim still broadcasts
        assert plans.uses_take_ordered(df)  # top-k never a global sort
        # and the vanilla plan really does shuffle — the comparison that
        # makes the zero above meaningful
        assert plans.count_shuffle_exchanges(_q("q_tpch_q3", spark, sf_dir)) >= 2
        # identical rows to the unbucketed query
        got = [tuple(r) for r in df.collect()]
        want = [tuple(r) for r in _q("q_tpch_q3", spark, sf_dir).collect()]
        assert got == want and len(got) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        import re

        tag = re.sub(r"[^A-Za-z0-9]+", "_", sf_dir.strip("/"))
        spark.sql(f"DROP TABLE IF EXISTS b_orders_{tag}")
        spark.sql(f"DROP TABLE IF EXISTS b_lineitem_{tag}")


def test_skewed_join_salts_the_exchange(spark, sf_dir):
    """q_skewed_join must actually spread the hot key: the join operates
    on (hot_uid, __salt) — so any hash exchange/join keying includes the
    salt, never hot_uid alone — the replicated side carries the
    explode(sequence(0..15)) fan-out, and the two-phase aggregation's
    first exchange also keys on the salt. The salt must not leak into
    the output schema."""
    df = _q("q_skewed_join", spark, sf_dir)
    assert set(df.columns) == {"tier", "event_type", "n_rows", "total"}
    plan = plans.physical_plan(df)
    assert "__salt" in plan and "explode" in plan.lower()
    # Force the join path visible even if the dim would broadcast at
    # test scale: at 100 TB the dimension is too big to broadcast, and
    # the exchange that replaces it must hash on keys+salt.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        unbroadcast = plans.physical_plan(_q("q_skewed_join", spark, sf_dir))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    import re

    part_keys = re.findall(r"hashpartitioning\(([^)]*)\)", unbroadcast)
    salted = [k for k in part_keys if "hot_uid" in k and "__salt" in k]
    # Both JOIN inputs must exchange on (hot_uid, __salt). The dim's own
    # pre-replication distinct() legitimately hashes on hot_uid alone —
    # that side is small by contract; only the skewed flow needs salt.
    assert len(salted) >= 2


# Queries allowed a nested-loop/cartesian plan: both inputs are bounded
# (dimension tables or 1-row aggregates), documented in each builder.
# q_tpch_q22's is the 1-row avg_bal scalar broadcast.
_NESTED_LOOP_OK = {
    "q_cross_join", "q_scalar_subquery", "q_tpch_q22",
    # broadcast of a 1-row global aggregate (N, avgdl) — constant-size
    # build side, same bounded pattern as q_scalar_subquery
    "q_bm25_terms",
    # same 1-row stats broadcast from the bm25_write index's stats table
    "q_bm25_search",
    # broadcast of a 1-row global threshold (0.1% of total value) —
    # constant-size build side, same bounded pattern
    "q_tpch_q11",
    # broadcast of the 1-row corpus token total — same bounded pattern
    "q_unigram_lm",
    # broadcast of the 1-row vocabulary size (add-α denominator)
    "q_bigram_lm",
    # broadcast of the 1-row tercile-threshold percentile aggregate
    "q_perplexity_sample",
    # broadcast of the 1-row mean-weight sparsifier threshold
    # (graph.strong_tie_edges) — same bounded pattern
    "q_triangles",
    # broadcast of the 1-row basket-total (association lift denominator)
    "q_association_rules",
    # broadcast of the 1-row corpus token total (KL's q denominator)
    "q_source_kl",
    # broadcast of the 1-row quintile-threshold aggregate — same
    # bounded pattern
    "q_rfm",
    # broadcast of the 1-row tempered-weight total (Σ n_i^τ) into the
    # per-domain rates table — same bounded pattern
    "q_domain_mixture",
    # broadcast of the same 1-row tempered-weight total into the
    # per-domain epochs table (sampling.epoch_mixture_sample)
    "q_epoch_mixture",
    # broadcast of the 1-row exact-percentile quartile thresholds
    # (sampling.curriculum_order) — same bounded pattern as q_rfm
    "q_curriculum_order",
    # inherits q_bm25_search's 1-row (N, avgdl) stats broadcast on its
    # sparse arm; the RRF fusion itself joins two ≤k ranked sets
    "q_hybrid_search",
    # source×source pair dim (20×20 at any corpus size) built by a
    # broadcast theta self-join of the DISTINCT key values — the
    # corpus-sized sketch build below it is equi-join only
    "q_kmv_jaccard",
    # crossJoin of two 1-row frames (merged-sketch size × its estimate)
    # — same bounded pattern as q_scalar_subquery
    "q_kmv_rollup",
    # broadcast of the 1-row (n_keys, n_rows) stats aggregate into the
    # ≤top-k heaviest-keys frame — same bounded pattern
    "q_skew_profile",
}


def test_no_nested_loop_joins_on_unbounded_inputs(spark, sf_dir):
    """Regression gate: no declared query may plan a
    BroadcastNestedLoopJoin or CartesianProduct on non-dim inputs — at
    100 TB either is a quadratic scan."""
    offenders = []
    for name in REGISTRY:
        if name in _NESTED_LOOP_OK:
            continue
        plan = plans.physical_plan(_q(name, spark, sf_dir))
        if "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"nested-loop/cartesian plans: {offenders}"


# Shuffle-exchange ceilings for the near-dup pipeline (pinned at the
# single-pass plan shapes; a per-band UNION ALL regression — the trap
# simhash_pairs_sql documents — blows well past these).
_SHUFFLE_CEILING = {
    "q_dedup_exact": 1,
    "q_minhash_lsh": 4,
    "q_simhash": 2,
    "q_simhash_pairs": 6,
    "q_neardup_verified": 6,
    # explode-distinct + self-join (exchange reused) + pair-agg; per-doc
    # counts ride the join as expression columns, so no counts joins.
    "q_ngram_jaccard": 4,
    # tf agg + df agg + df join + doc window whose exchange the final
    # rank reuses; one shuffle more than a term-window df would cost,
    # bought deliberately: the join is AQE-skew-splittable on Zipfian
    # terms, a hot-term window partition is not (textstats.bm25_terms)
    "q_bm25_terms": 5,
    # winner election on slim hash projection + kept-POSITIONS agg;
    # reassembly indexes the re-split text at the base scan, so line
    # text never enters an exchange (r13; was 3 with the text-carrying
    # semi join + collect_list reassembly)
    "q_line_dedup": 2,
    # change-detect lag + validity lead + version share ONE exchange
    "q_scd2": 1,
    # collect_list + codegen'd fold: one exchange total
    "q_funnel": 1,
}


def test_neardup_shuffle_ceilings(spark, sf_dir):
    # Hermetic plan shapes: earlier tests may have populated the cache
    # (the LSH operators persist their slim intermediates), and an
    # InMemoryRelation substitution changes the printed exchange count.
    spark.catalog.clearCache()
    over = {}
    for name, ceiling in _SHUFFLE_CEILING.items():
        n = plans.count_shuffle_exchanges(_q(name, spark, sf_dir))
        if n > ceiling:
            over[name] = (n, ceiling)
    assert not over, f"shuffle-count regressions (actual, ceiling): {over}"


def test_lake_column_map_zero_shuffles(spark, sf_dir):
    # rename/drop/re-add are metadata; the read plan is a UNION of
    # pinned parquet scans with projection-only mapping — any exchange
    # here means the mapping leaked into a shuffle
    df = _q("q_lake_column_map", spark, sf_dir)
    assert plans.count_shuffles(df) == 0
    assert "BatchEvalPython" not in plans.physical_plan(df)


def test_lake_type_widen_zero_shuffles(spark, sf_dir):
    df = _q("q_lake_type_widen", spark, sf_dir)
    assert plans.count_shuffles(df) == 0


def test_lake_generated_zero_shuffles(spark, sf_dir):
    df = _q("q_lake_generated", spark, sf_dir)
    assert plans.count_shuffles(df) == 0


def test_wordpiece_tokenize_arrow_map_only(spark, sf_dir):
    # greedy encode: one Arrow-batched map, vocab broadcast — pieces
    # never shuffle; only doc_id + counts leave the stage
    df = _q("q_wordpiece_tokenize", spark, sf_dir)
    assert plans.count_shuffles(df) == 0
    assert "MapInPandas" in plans.physical_plan(df)
