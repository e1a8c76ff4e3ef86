"""Driver-contract smoke tests (SURVEY.md §5.2.4)."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"n_name", "revenue"}


def test_every_oracle_key_has_query():
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 40


def test_driver_window_covers_llm_pipeline_queries():
    """The driver's correctness gate checks the FIRST 50 entries of
    queries() in registration order. Every LLM-pipeline query (text,
    dedup tiers, similarity, multimodal, stateful anchor) must sit
    inside that window, or the charter centerpiece ships unverified."""
    from aws_data_pipeline_ads_spark.queries import DRIVER_WINDOW

    window = list(entry_mod.queries())[:DRIVER_WINDOW]
    # r10 rotation: the two new r10 MV queries (star, distinct) and
    # the tail-staged variance MV take slots for first driver
    # exposure; three r09-hash-verified members rotated to the tail
    # with in-window family anchors kept. Rotated-out siblings carry
    # their own hash history (CORRECTNESS_r0*.json).
    must_cover = {
        # r12 rotation: the three new r12 queries (MERGE evolution,
        # streaming CDC replication, IVF contract twin) take slots for
        # first driver exposure; q_lake_mv_leftjoin /
        # q_unigram_tok_vocab / q_chat_flatten (each hash-verified
        # r10 AND r11) rotated to the tail with in-window family
        # anchors kept (fulljoin MV / unigram_tokenize /
        # preference_pairs)
        "q_lake_merge_evolve", "q_lake_cdc_stream",
        "q_embedding_ivf_check",
        "q_unigram_tokenize", "q_preference_pairs",
        # new in r10: star MV + COUNT(DISTINCT) MV + the staged
        # variance MV; new in r11: the FULL OUTER join MV
        # (q_lake_mv_daily, hash-verified r9+r10, yielded its slot)
        "q_lake_mv_star", "q_lake_mv_fulljoin",
        # r11 rotation: the r10-flagged weak bench pair re-enters the
        # window for post-fix re-verification (q_lake_mv_minmax /
        # q_lake_mv_join, hash-verified r9 AND r10, yielded the slots)
        "q_approx_distinct_check", "q_embedding_knn",
        # family anchors kept from the r8 rotation; q_kmv_distinct
        # (hash-verified r9) yielded its slot to the r10 KMV-sketch MV
        "q_lake_mv_distinct_kmv", "q_hybrid_search",
        # (q_winnow_fingerprint, hash-verified r8+r9, yielded its slot
        # to the r10 deferred key-set delete)
        # lake data-skipping first-exposure anchors kept in-window
        "q_lake_hilbert_scan", "q_lake_sum_agg",
        # the two r7 weak marks, driver-verified r08, kept as anchors
        "q_embedding_pca", "q_audio_segments",
        # stacked caggs + write-time expectations + shallow clone,
        # first exposure r10
        "q_lake_mv_hierarchical", "q_lake_expectations",
        # r12 session 2 rotation: column mapping, type widening,
        # generated columns, WordPiece trilogy completion + the dHash
        # promotion anchor take slots for first driver exposure;
        # q_lake_clone / q_lake_mv_distinct / q_hll_rollup /
        # q_lake_gdpr_defer / q_lake_changes_feed (each hash-verified
        # r10 AND r11) rotated to the tail with in-window family
        # anchors kept (replica / mv star+variance+fulljoin /
        # approx_distinct_check / merge_clauses / cdc_types)
        "q_lake_column_map", "q_lake_type_widen", "q_lake_generated",
        "q_lake_update_defer",
        "q_wordpiece_vocab", "q_wordpiece_tokenize",
        # (q_unigram_lm / q_top_ngrams / q_length_outliers /
        # q_filter_attrition, all hash-verified r9, yielded their
        # slots to r10 first exposures)
        "q_neardup_clusters_lsh", "q_image_neardup",
        "q_bpe_merges",
        # embedding serving tiers
        "q_embedding_pq", "q_embedding_opq", "q_embedding_ivfpq",
        "q_embedding_ann",
        # multimodal decode tiers
        "q_video_frames", "q_video_metadata", "q_audio_features",
        "q_audio_spectral", "q_audio_mp3", "q_image_exif",
        # lake data-skipping + metadata-stats anchors
        "q_lake_zorder_scan", "q_lake_time_scan", "q_lake_stats_agg",
        # new in r11: three-clause MERGE + CDC row classification
        # (q_rolling_window / q_resample_fill, hash-verified r9+r10,
        # yielded their slots; q_hypertable_rollup anchors the family)
        "q_lake_merge_clauses", "q_lake_cdc_types", "q_lake_replica",
        # time-series / analytics anchors
        "q_hypertable_rollup",
        "q_attribution_join", "q_quantile_sketch",
        "q_percentile_approx",
        # verified anchors for the core families
        "q_join_flagship", "q_minhash_lsh",
        "q_tumbling_window", "q_lake_pruned_scan",
    }
    missing = must_cover - set(window)
    assert not missing, f"LLM-pipeline queries outside driver window: {missing}"


def test_oracle_sql_covers_most_queries():
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    # Only genuinely non-SQL-expressible ops (approx sketches, hash-
    # family-specific LSH, approximate ANN) may omit the oracle: ≥90%
    # of declared queries must carry a DuckDB twin.
    assert len(osql) >= 0.9 * len(qs)
    rows_only = sorted(set(qs) - set(osql))
    assert all(
        n in {
            "q_minhash_lsh", "q_embedding_ivf", "q_neardup_verified",
            "q_neardup_clusters_lsh",  # LSH recall, engine-specific
            "q_approx_distinct",  # benched entry re-split to sketch-only
            # in r11 (the r1 bench shape — HLL++ registers are engine-
            # specific); its 3σ accuracy contract is hash-gated by the
            # unbenched q_approx_distinct_check twin
            # (r10 promotions to hash-checked oracles: q_approx_distinct,
            # q_percentile_approx, q_hll_rollup via their exact accuracy/
            # rank contracts; q_embedding_ann via a FULL value-hash
            # replay of bucket assignment + pruned top-k; q_bpe_merges
            # via the round-0 argmax + monotonicity invariants)
            "q_image_neardup",  # dHash runs in the Arrow decode stage
            # (mapInPandas) — no SQL twin; pytest pins reference + recall
            "q_video_frames",  # JPEG entropy decode in the Arrow stage —
            # not SQL-expressible; mux→demux→decode golden pytest
            # (q_video_metadata PROMOTED r11: arithmetic header oracle
            # over the mux constants, q_audio_mp3 posture;
            # q_audio_features PROMOTED r11: full value-hash oracle —
            # DuckDB replays the int16 decode + exact-float RMS fold;
            # q_embedding_pca PROMOTED r11: exact corpus moments + the
            # projected-variance≡eigenvalue identity;
            # q_audio_segments PROMOTED r11: int16 replay + exact
            # frame-RMS gate + gaps-and-islands segment merge)
            "q_audio_spectral",  # rFFT descriptors — FFT has no SQL
            # twin; sine-golden + determinism pytest
            "q_embedding_ivfpq",  # IVF-PQ composite — approximate by
            # nature; full-probe==flat-PQ + pruning pytest-pinned
            "q_embedding_pq",  # PQ/ADC shortlist — approximate by
            # nature (recall < 1); determinism + recall +
            # full-shortlist==brute pytest-pinned
            "q_embedding_opq",  # rotated-PQ (OPQ) tier — approximate
            # by nature; recall floor + rotation-invariant
            # full-shortlist==brute + determinism pytest-pinned
            # (q_unigram_tokenize was PROMOTED to hash-checked in r9,
            # q_unigram_tok_vocab in r10: exact invariants oracles —
            # word/char/unk counts resp. coverage/size/oov/len/logp)
        }
        for n in rows_only
    ), f"unexpected rows-only queries: {rows_only}"
