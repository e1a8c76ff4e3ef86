"""Benchmark decontamination: flag corpus documents sharing word
n-grams with a held-out evaluation set.

Training-data pipelines must drop documents that leak benchmark content
(the GPT-3/PaLM/Llama reports all describe exactly this n-gram-overlap
screen). The scalable shape is the same as every dedup tier here:
explode both sides to (id, shingle), equi-join on the shingle, count
hits per document — linear in corpus shingles, shuffled on the shingle
key, with the (small) benchmark side broadcast-able.

The shingle extraction mirrors dedup.doc_shingle_sets: k-token windows,
whole text as one shingle for shorter documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_data_pipeline_ads_spark.operators.dedup import doc_shingle_sets


def contamination_report(corpus: DataFrame, benchmark: DataFrame,
                         k: int = 5) -> DataFrame:
    """Per corpus doc: how many distinct k-gram shingles it shares with
    the benchmark, and a contaminated flag (any overlap).

    Inner mechanics: distinct (doc_id, shingle) on the corpus side,
    distinct shingles on the benchmark side, equi-join on shingle,
    count per doc. Clean documents (zero hits) are NOT emitted — at
    100 TB the report is the quarantine list, and the keep-side is the
    anti-join (`decontaminate`)."""
    corpus_sh = doc_shingle_sets(corpus, k=k)
    bench_sh = doc_shingle_sets(benchmark, k=k).select("tok").distinct()
    return (
        corpus_sh.join(bench_sh, "tok")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select("doc_id", "n_hits", F.lit(True).alias("contaminated"))
    )


def decontaminate(corpus: DataFrame, benchmark: DataFrame, k: int = 5) -> DataFrame:
    """The keep-side: corpus rows with NO shingle overlap with the
    benchmark — a left_anti join against the hit list (keys only move
    through the shuffle, never document bodies)."""
    hits = contamination_report(corpus, benchmark, k).select("doc_id")
    return corpus.join(hits, "doc_id", "left_anti")


def contamination_overlap(corpus: DataFrame, benchmark: DataFrame,
                          k: int = 5,
                          threshold_pct: int = 70) -> DataFrame:
    """GRADED contamination: per corpus doc, the FRACTION of its
    distinct k-gram shingles that appear in the benchmark — the
    severity screen the PaLM/GPT-4 reports run on top of the binary
    any-overlap flag (drop only examples above ~70% overlap; a stray
    quoted sentence shouldn't cost a whole document).

    Output: (doc_id, n_shingles, n_hits, overlap_frac, flagged) for
    EVERY corpus doc — clean docs report 0 hits; at 100 TB this is the
    per-doc QC metadata a curation run writes next to the corpus.

    Scale shape: ONE distinct-shingle explode of the corpus, a
    broadcast LEFT join that marks benchmark membership per shingle
    (no exchange — the benchmark set is dim-sized), and ONE per-doc
    groupBy computing both counts — 2 shuffles total; a separate
    tot/hits branch pair would tokenize and distinct the corpus twice.
    The flag compares integers (n_hits * 100 >= n_shingles *
    threshold_pct) so the cut is exact and engine-identical — never
    derived from the rounded float.
    """
    corpus_sh = doc_shingle_sets(corpus, k=k)
    bench_sh = (
        doc_shingle_sets(benchmark, k=k).select("tok").distinct()
        .withColumn("__hit", F.lit(1).cast("long"))
    )
    marked = corpus_sh.join(F.broadcast(bench_sh), "tok", "left")
    agged = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias(
            "n_hits"
        ),
    )
    return agged.select(
        "doc_id",
        "n_shingles",
        "n_hits",
        F.round(F.col("n_hits") / F.col("n_shingles"), 6).alias(
            "overlap_frac"
        ),
        (F.col("n_hits") * 100 >= F.col("n_shingles") * threshold_pct).alias(
            "flagged"
        ),
    )
