"""Declared query set — importing this package populates the registry.

Registration ORDER is part of the driver contract: the correctness gate
checks the first 50 entries of `queries()`. `_WINDOW` pins which 50
queries occupy that window — every operator family is represented, and
the LLM-data-pipeline set (text/dedup/similarity/multimodal) leads.
`_TAIL` holds near-redundant variants whose operators are already
covered by an in-window sibling (e.g. `q_rename_project` is the same
projection machinery as `q_scan_project`); they remain fully declared,
oracle-checked locally (tools/check_oracle.py) and pytest-anchored.
The partition is validated at import: a query in neither list, or in
both, is an error — new queries must be placed deliberately.
"""

from aws_data_pipeline_ads_spark.queries import (  # noqa: F401
    events_q,
    ref_parity,
    relational_q,
    scalar_q,
    text_q,
    vector_q,
)
from aws_data_pipeline_ads_spark.queries.registry import REGISTRY, QueryDef

__all__ = ["REGISTRY", "QueryDef", "queries", "oracle_sql", "bench_queries",
           "DRIVER_WINDOW"]

DRIVER_WINDOW = 50  # driver checks the first N entries of queries()

# The 50 queries the driver verifies, in order. LLM-pipeline families
# first (charter centerpiece), then one representative per remaining
# operator family.
_WINDOW: list[str] = [
    # ==== r10 rotation: the late-r9 variance MV (tail-staged last
    # round, judge-verified hash-pass at sf0.01 hostile TZ) plus the
    # two NEW r10 views (k-dim STAR MV, COUNT(DISTINCT) MV) take slots
    # for first driver exposure. Three r09-hash-verified members
    # rotated to the tail (q_image_gif, q_image_bmp, q_lake_tag_scan);
    # their families keep in-window anchors (q_image_neardup +
    # q_image_exif for image codecs; the zorder/time/hilbert/stats/sum
    # lake tier for commit-log scans). =====================================
    # -- r8/r9 MV additions, driver-verified r9, kept as anchors
    # (q_lake_mv_refresh, hash-verified r8 AND r9, yields its slot to
    # the NEW r10 LEFT-join MV first exposure; the single-table MV
    # family stays anchored by q_lake_mv_variance/minmax/daily) -----------
    # -- NEW in r12: MERGE schema evolution, first exposure;
    # q_lake_mv_leftjoin (hash-verified r10 AND r11) yields its slot —
    # the outer-join MV family stays anchored by q_lake_mv_fulljoin ------
    "q_lake_merge_evolve",
    # -- NEW in r12: streaming CDC replication (lake_cdc_sink), first
    # exposure; q_unigram_tok_vocab (hash-verified r10 AND r11) yields
    # its slot — the unigram family stays anchored by q_unigram_tokenize
    "q_lake_cdc_stream",
    # -- NEW in r12: IVF contract twin (probe-restricted exactness),
    # first exposure; q_chat_flatten (hash-verified r10 AND r11) yields
    # its slot — SFT-prep family anchored by q_preference_pairs --------
    "q_embedding_ivf_check",
    "q_unigram_tokenize", "q_preference_pairs",
    # -- NEW in r10: k-dim star MV + exact COUNT(DISTINCT) MV +
    # derived-bucket continuous aggregate, first exposure; variance MV
    # rotated in from the tail stage (q_seasonal_decompose, hash-
    # verified r9, yields its slot) ---------------------------------------
    "q_lake_mv_star",
    # -- NEW in r11: FULL OUTER join MV (both-side NULL extensions via
    # match-count crossings), first exposure; q_lake_mv_daily (hash-
    # verified r9 AND r10) yields its slot ---------------------------------
    "q_lake_mv_fulljoin",
    # -- r11 rotation: the two r10-flagged WEAK bench queries enter the
    # window so CORRECTNESS_r11 re-verifies them alongside their bench
    # fix — q_approx_distinct_check (NEW: the 3σ contract split out of
    # the benched sketch-only q_approx_distinct) and q_embedding_knn
    # (bench-methodology note in bench.py; exact-fold oracle). The
    # doubly-verified (r9+r10) q_lake_mv_minmax / q_lake_mv_join yield
    # their slots; the MV family stays anchored by
    # star/distinct/daily/variance/leftjoin/kmv/hierarchical ---------------
    "q_approx_distinct_check", "q_embedding_knn",
    # -- family anchors kept from the r8 rotation (winnowing, hybrid
    # retrieval; both corpus-health fits are r08-hash-verified and
    # rotate to the tail). q_kmv_distinct (hash-verified r9) yields
    # its slot to the NEW r10 KMV-sketch MV first exposure — the same
    # portable estimator, now as incremental view state -------------------
    "q_lake_mv_distinct_kmv", "q_hybrid_search",
    # -- NEW in r10 session 2: hierarchical (stacked) continuous
    # aggregates + write-time expectations with quarantine, first
    # exposure; q_unigram_lm and q_top_ngrams (both hash-verified r9)
    # yield their slots, text family anchored by q_length_outliers+ -----
    "q_lake_mv_hierarchical", "q_lake_expectations",
    # -- NEW in r12 session 2: metadata-only column mapping (rename/
    # drop without rewrite, fresh-physical re-add), first exposure;
    # q_lake_clone (hash-verified r10 AND r11) yields its slot — the
    # zero-copy-fork family stays anchored by q_lake_replica ---------------
    "q_lake_column_map",
    # -- NEW in r12 session 2: metadata-only TYPE WIDENING (int→long
    # with beyond-int-range appends), first exposure; q_lake_gdpr_defer
    # (hash-verified r10 AND r11) yields its slot — the MoR-delete
    # family stays anchored by q_lake_merge_clauses + tail GDPR tiers --
    "q_lake_type_widen",
    # -- NEW in r12 session 2: GENERATED ALWAYS AS columns, first
    # exposure; q_lake_changes_feed (hash-verified r10 AND r11) yields
    # its slot — the CDC family stays anchored by q_lake_cdc_types /
    # q_lake_cdc_stream / q_lake_replica ------------------------------------
    "q_lake_generated",
    # -- NEW in r12 session 2: merge-on-read UPDATE (scoped deferred
    # predicate + post-image append), first exposure; q_lake_mv_variance
    # (hash-verified r10 AND r11) yields its slot — the single-table MV
    # family stays anchored by q_lake_mv_star/q_lake_mv_distinct_kmv/
    # q_lake_mv_hierarchical --------------------------------------------
    "q_lake_update_defer",
    # -- LLM text battery (kept: hash anchors for the text family whose
    # siblings rotated out; q_length_outliers, hash-verified r9, yields
    # its slot to the r10 clone first exposure) ---------------------------
    "q_neardup_clusters_lsh", "q_image_neardup",
    "q_bpe_merges",
    # -- NEW in r12 session 2: WordPiece trainer + greedy encode,
    # first exposures (completes the BPE/unigram/WordPiece trilogy);
    # q_lake_mv_distinct and q_hll_rollup (both hash-verified r10 AND
    # r11) yield their slots — the MV family keeps six in-window
    # anchors and the approx-distinct contract stays hash-gated via
    # q_approx_distinct_check -----------------------------------------------
    "q_wordpiece_vocab", "q_wordpiece_tokenize",
    # -- embedding serving tiers (trained-model tiers rows-only by
    # nature, each pytest-pinned against an exact full-probe/brute
    # twin; q_embedding_ann promoted r10 to a FULL value-hash oracle —
    # DuckDB re-derives buckets from the plane literals and replays
    # the pruned top-k). q_embedding_pca carries the r7 canonicalizer
    # fix — must re-verify ------------------------------------------------
    "q_embedding_pq", "q_embedding_opq", "q_embedding_ivfpq",
    "q_embedding_ann", "q_embedding_pca",
    # -- multimodal decode tiers (rows-only) + two arithmetic-oracle
    # header walks. q_audio_segments carries the r7 empty-result fix —
    # must re-verify non-empty --------------------------------------------
    "q_video_frames", "q_video_metadata", "q_audio_features",
    "q_audio_segments", "q_audio_spectral", "q_audio_mp3", "q_image_exif",
    # -- commit-log data skipping: zorder + time-range + Hilbert (first
    # exposure) + metadata-only stats/SUM (q_lake_sum_agg first
    # exposure). CoW DELETE/UPDATE/RESTORE/point-lookup/GDPR all
    # hash-verified r07, rotated to tail ----------------------------------
    "q_lake_zorder_scan", "q_lake_time_scan", "q_lake_hilbert_scan",
    "q_lake_stats_agg", "q_lake_sum_agg",
    # -- NEW in r11: three-clause MERGE (cover-scoped rewrite) + CDC
    # row classification, first exposure; q_rolling_window and
    # q_resample_fill (hash-verified r9 AND r10) yield their slots,
    # time-series family anchored by q_hypertable_rollup -------------------
    "q_lake_merge_clauses", "q_lake_cdc_types",
    # -- NEW in r11: CDC replication loop (feed → merge-apply), first
    # exposure; q_profile (hash-verified r7..r10) yields its slot,
    # profiling family anchored by q_quantile_sketch/q_histogram ----------
    "q_lake_replica",
    # -- time-series / analytics anchors ----------------------------------
    "q_hypertable_rollup",
    "q_attribution_join", "q_quantile_sketch",
    "q_percentile_approx",
    # -- verified anchors: joins, LSH dedup, streaming window, lake
    # pruned scan ----------------------------------------------------------
    "q_join_flagship", "q_minhash_lsh", "q_tumbling_window",
    "q_lake_pruned_scan",
]

# Declared queries past the driver window. EVERY tail entry now carries
# >=1 prior driver hash-verification (its round is recorded in
# CORRECTNESS_r0*.json) — the r7 rotation moved the entire
# never-driver-verified backlog in-window, so the tail is exactly the
# multi-round-verified set. All remain fully declared and are
# oracle-checked locally every round (tools/check_oracle.py at sf0.1,
# committed as ORACLE_SF01_r*.txt); in-window anchors keep each operator
# family hash-covered against regressions this round.
_TAIL: list[str] = [
    # -- r12 rotation: r10+r11 doubly-hash-verified LEFT-join MV
    # yields its slot to the MERGE-evolution first exposure; r12
    # session 2 rotates q_lake_clone (r10+r11 verified) out for the
    # column-mapping first exposure ---------------------------------------
    "q_lake_mv_leftjoin", "q_unigram_tok_vocab", "q_chat_flatten",
    "q_lake_clone", "q_lake_mv_distinct", "q_hll_rollup",
    "q_lake_gdpr_defer", "q_lake_changes_feed", "q_lake_mv_variance",
    # -- r11 rotation: r9+r10 doubly-hash-verified anchors that
    # yielded their slots to the weak-bench re-verification pair and
    # the r11 first exposures (FULL-join MV, MERGE clauses, CDC types) ----
    "q_lake_mv_minmax", "q_lake_mv_join", "q_lake_mv_daily",
    "q_rolling_window", "q_resample_fill", "q_profile",
    # -- r10 rotation: r09-hash-verified window members that yielded
    # their slots to the three MV first exposures (image-codec family
    # anchored in-window by q_image_neardup/q_image_exif; lake tags by
    # the zorder/time/hilbert/stats/sum tier) -----------------------------
    "q_image_gif", "q_image_bmp", "q_lake_tag_scan",
    "q_seasonal_decompose", "q_lake_mv_refresh", "q_kmv_distinct",
    "q_unigram_lm", "q_top_ngrams", "q_length_outliers",
    "q_filter_attrition", "q_winnow_fingerprint",
    # -- r9 rotation: r08-hash-verified window members that yielded
    # their slots to the 9 r8-addition first exposures --------------------
    "q_kmv_jaccard", "q_kmv_rollup", "q_kmv_served", "q_winnow_pairs",
    "q_heaps_fit", "q_zipf_fit", "q_epoch_mixture",
    "q_contamination_overlap", "q_neardup_keep_best", "q_skew_profile",
    "q_curriculum_order",
    # -- r8 rotation: hash-verified-r07 window members that yielded
    # their slots to the 16 first-exposure late-r7 tiers ------------------
    "q_pii_redaction", "q_token_bpe", "q_chunk_documents",
    "q_pack_sequences", "q_corpus_shuffle", "q_domain_caps",
    "q_data_split", "q_sample_weighted", "q_ngram_jaccard_uncapped",
    "q_hard_negatives", "q_lake_delete", "q_lake_restore",
    "q_lake_update", "q_lake_point_lookup", "q_lake_gdpr_delete",
    "q_ntile_lpad",
    # -- r7 rotation: multi-round-verified queries yielded their
    # window slots to the first-exposure backlog ------------------------
    "q_dedup_exact", "q_asof_join", "q_tpch_q5", "q_gopher_rules",
    "q_decontaminate",
    "q_snapshot_diff", "q_heavy_hitters_cms", "q_skewed_join",
    "q_tpch_q3_bucketed", "q_incremental_dedup", "q_resolve_entities",
    "q_scd2", "q_merge_upsert", "q_tpch_q2", "q_tpch_q4", "q_tpch_q6",
    "q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_tpch_q10", "q_tpch_q11",
    "q_tpch_q12", "q_tpch_q16", "q_tpch_q17", "q_tpch_q20", "q_bm25_search",
    "q_normalize_text", "q_bigram_lm", "q_source_kl", "q_corpus_prep",
    "q_cohort_retention", "q_rfm", "q_histogram", "q_correlation",
    "q_heavy_hitters_served", "q_lang_id", "q_leakage_safe_split",
    "q_line_dedup", "q_simhash_pairs", "q_binary_meta", "q_semdedup",
    "q_video_codec_triage", "q_json_extract", "q_session_gap", "q_ewma",
    # -- earlier-round rotations (see git history for per-round notes) ---
    "q_curation_pipeline", "q_quality_classifier", "q_domain_mixture",
    "q_repetition_score", "q_sample_stratified", "q_contamination",
    "q_token_count", "q_bm25_terms", "q_ngram_jaccard", "q_neardup_verified",
    "q_neardup_clusters", "q_perplexity_sample", "q_record_linkage",
    "q_embedding_ivf_full", "q_session_paths", "q_anomaly_zscore",
    "q_pagerank", "q_limit_topk", "q_run_summary", "q_dedup_latest",
    "q_multitouch", "q_join_star", "q_semi_anti", "q_triangles",
    "q_agg_rollup", "q_count_distinct", "q_association_rules",
    "q_window_rank", "q_set_ops", "q_sql_over_lake", "q_tpch_q3",
    "q_tpch_q21", "q_quality_score", "q_span_dedup", "q_embedding_sq8",
    "q_user_totals", "q_scan_project", "q_markov_transitions", "q_range_join",
    "q_pivot_counts", "q_simhash", "q_doc_fingerprint", "q_embedding_neardup",
    "q_funnel", "q_tpch_q1", "q_math_funcs", "q_grouping_sets",
    "q_window_running", "q_string_funcs", "q_date_parts", "q_asof_lastclick",
    "q_approx_distinct", "q_dedup", "q_sliding_window", "q_json_typed",
    "q_surrogate_hash", "q_cast_default", "q_truncate_concat",
    "q_rename_project", "q_null_guard", "q_status_filter", "q_envelope_date",
    "q_window_lag_lead", "q_agg_cube", "q_set_ops_all", "q_unpivot",
    "q_map_keys", "q_scalar_subquery", "q_cross_join", "q_top_supplier",
    "q_tpch_q13", "q_tpch_q14", "q_tpch_q19", "q_tpch_q22", "q_tpch_q18",
    "q_embedding_ivf", "q_text_stats", "q_array_funcs", "q_percentile",
]


def _apply_order() -> None:
    ordered = _WINDOW + _TAIL
    dupes = {n for n in ordered if ordered.count(n) > 1}
    if dupes:
        raise ValueError(f"queries listed twice in window/tail: {sorted(dupes)}")
    missing = [n for n in ordered if n not in REGISTRY]
    unplaced = [n for n in REGISTRY if n not in ordered]
    if missing or unplaced:
        raise ValueError(
            f"window/tail out of sync with registry: missing={missing} "
            f"unplaced={unplaced}"
        )
    if len(_WINDOW) != DRIVER_WINDOW:
        raise ValueError(
            f"_WINDOW has {len(_WINDOW)} entries, driver checks {DRIVER_WINDOW}"
        )
    reordered = {name: REGISTRY[name] for name in ordered}
    REGISTRY.clear()
    REGISTRY.update(reordered)


_apply_order()


def queries():
    """name → (spark, sf_dir) -> DataFrame, for every declared query."""
    return {name: qd.build for name, qd in REGISTRY.items()}


def oracle_sql():
    """name → DuckDB oracle SQL (only for SQL-expressible queries)."""
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}


def bench_queries():
    """Headline queries timed by bench.py."""
    return {name: qd.build for name, qd in REGISTRY.items() if qd.bench}
