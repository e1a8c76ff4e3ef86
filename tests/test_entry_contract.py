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
    # r6 rotation: the window's job is now BACKLOG BURNDOWN — 32
    # never-driver-verified queries hold slots (round-5 operators, the
    # 13 TPC-H dials, LLM tail, the streaming-served CMS) while every
    # LLM-pipeline FAMILY keeps a verified anchor in-window. The
    # rotated-out siblings (q_curation_pipeline, q_token_count,
    # q_bm25_terms, q_ngram_jaccard, q_neardup_verified/_clusters,
    # q_record_linkage, etc. — each hash-verified r01-r05) are
    # machinery-covered per the _TAIL annotations.
    must_cover = {
        # one verified anchor per LLM-pipeline family
        "q_lang_id", "q_leakage_safe_split",              # text analysis + split
        "q_dedup_exact", "q_line_dedup",                  # exact/line dedup
        "q_minhash_lsh", "q_simhash_pairs",               # near-dup tiers
        "q_decontaminate",                                # bloom filter
        "q_binary_meta",                                  # multimodal
        "q_embedding_knn", "q_semdedup",                  # similarity
        "q_tumbling_window", "q_session_gap", "q_ewma",   # streaming/TS
        "q_json_extract",                                 # scalar
        # (q_array_funcs/q_percentile — hash-verified r01-r05 — later
        # yielded their slots to the two new round-6 queries below)
        "q_join_flagship", "q_asof_join",                 # joins
        # the r6 first-exposure set the verdict named
        "q_snapshot_diff", "q_heavy_hitters_cms", "q_skewed_join",
        "q_tpch_q3_bucketed", "q_incremental_dedup", "q_resolve_entities",
        "q_scd2", "q_merge_upsert", "q_heavy_hitters_served",
        # new round-6 operators, first exposure
        "q_video_codec_triage", "q_lake_pruned_scan",
        # TPC-H never-verified backlog
        "q_tpch_q2", "q_tpch_q4", "q_tpch_q5", "q_tpch_q6", "q_tpch_q7",
        "q_tpch_q8", "q_tpch_q9", "q_tpch_q10", "q_tpch_q11",
        "q_tpch_q12", "q_tpch_q16", "q_tpch_q17", "q_tpch_q20",
        # LLM-pipeline + analytics tail, first exposure
        "q_bm25_search", "q_gopher_rules", "q_normalize_text",
        "q_bigram_lm", "q_source_kl", "q_corpus_prep",
        "q_cohort_retention", "q_rfm", "q_histogram", "q_correlation",
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
            "q_approx_distinct", "q_percentile_approx", "q_minhash_lsh",
            "q_embedding_ann", "q_embedding_ivf", "q_neardup_verified",
            "q_hll_rollup",  # sketch estimate, library-specific
            "q_neardup_clusters_lsh",  # LSH recall, engine-specific
            "q_bpe_merges",  # iterative argmax-per-round training —
            # not one SQL; pytest pins vs a pure-Python reference
            "q_image_neardup",  # dHash runs in the Arrow decode stage
            # (mapInPandas) — no SQL twin; pytest pins reference + recall
            "q_video_frames",  # JPEG entropy decode in the Arrow stage —
            # not SQL-expressible; mux→demux→decode golden pytest
            "q_video_metadata",  # ISO-BMFF/AVI container demux in the
            # Arrow stage — not SQL-expressible; round-trip + hostile
            # input pytests
            "q_audio_features",  # int16-PCM RMS over VARCHAR bytes —
            # not SQL-expressible; WAV-parse + determinism pytest
            "q_audio_segments",  # frame-RMS segmentation — not
            # SQL-expressible; silence/tone golden pytest
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
            "q_embedding_pca",  # eigendecomposition has no SQL twin;
            # numpy-equality + orthonormality pytest-pinned
        }
        for n in rows_only
    ), f"unexpected rows-only queries: {rows_only}"
