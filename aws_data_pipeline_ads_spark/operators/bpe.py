"""BPE tokenizer TRAINING on the corpus, as iterative Spark jobs.

`bpe_token_counts` (textstats.py) applies a fixed GPT-2-style
pre-tokenizer; this module learns the merge table itself — the actual
"train the tokenizer" stage of an LLM data pipeline (Sennrich et al.
2016, the algorithm GPT-2/RoBERTa vocabularies are built with).

Scale shape — the reason this survives 100 TB:
- Training runs on the DISTINCT-WORD table (word, count), not the
  corpus. One exchange builds it (hash on the word); Zipf's law caps
  its size at vocabulary scale, orders of magnitude below corpus scale.
  This is how industrial BPE trainers (subword-nmt, HuggingFace
  tokenizers) are structured too — frequency table in, merges out.
- Each merge round is ONE map-side-combined pair-count shuffle over
  that word table plus a 1-ROW TakeOrdered collect (the argmax pair) —
  bounded driver traffic, same class as IVF centroid selection.
- The chosen pair is folded back as a LITERAL into a codegen'd
  aggregate fold (greedy leftmost-first, the BPE merge rule) — no
  Python in the merge, no re-scan of the corpus.
- Lineage is cut per round with localCheckpoint (the graph.py posture)
  so R rounds stay R shallow jobs, not one 2^R plan.

Determinism: ties on pair count break lexicographically on (left,
right) — stable across partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_MARK = "</w>"  # end-of-word marker, per the original BPE formulation


def word_counts(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over whitespace-split lowercased text — the one
    corpus-scale exchange; everything after runs at vocabulary scale."""
    return (
        documents.select(
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _initial_symbols() -> F.Column:
    """word → [c1, c2, ..., ck</w>] (marker glued to the last char)."""
    chars = F.split(F.col("word"), "")
    k = F.size(chars)
    return F.concat(
        F.slice(chars, 1, k - 1),
        F.array(F.concat(F.element_at(chars, -1), F.lit(END_MARK))),
    )


def _adjacent_pairs(syms) -> F.Column:
    """array of (left, right) structs for each adjacent symbol pair."""
    n = F.size(syms)
    return F.zip_with(
        F.slice(syms, 1, n - 1),
        F.slice(syms, 2, n - 1),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )


def _apply_merge(syms, left: str, right: str,
                 merged: str | None = None) -> F.Column:
    """Greedy leftmost-first merge of (left,right) → `merged`
    (default left+right; WordPiece passes left+right-sans-## — see
    operators/wordpiece.py) in one codegen'd fold: carry the previous
    symbol; when (prev, cur) is the pair, emit the merged token and
    clear the carry (so 'aaaa' under (a,a) becomes ['aa','aa'], the
    BPE rule)."""
    if merged is None:
        merged = left + right
    out_t = "array<string>"
    return F.aggregate(
        syms,
        F.struct(
            F.lit(None).cast(out_t).alias("out"),  # None → [] via coalesce
            F.lit(None).cast("string").alias("prev"),
        ),
        lambda acc, s: F.when(
            acc.prev.isNotNull() & (acc.prev == left) & (s == right),
            F.struct(
                F.concat(
                    F.coalesce(acc.out, F.array().cast(out_t)),
                    F.array(F.lit(merged)),
                ).alias("out"),
                F.lit(None).cast("string").alias("prev"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    acc.prev.isNull(), F.coalesce(acc.out, F.array().cast(out_t))
                ).otherwise(
                    F.concat(
                        F.coalesce(acc.out, F.array().cast(out_t)),
                        F.array(acc.prev),
                    )
                ).alias("out"),
                s.alias("prev"),
            )
        ),
        lambda acc: F.when(acc.prev.isNull(), F.coalesce(acc.out, F.array().cast(out_t)))
        .otherwise(
            F.concat(F.coalesce(acc.out, F.array().cast(out_t)), F.array(acc.prev))
        ),
    )


def bpe_train(documents: DataFrame, n_merges: int = 8,
              text_col: str = "text") -> list[tuple[str, str, int]]:
    """Learn `n_merges` BPE merges; returns [(left, right, pair_count)]
    in merge order. Driver traffic: ONE row per round."""
    words = word_counts(documents, text_col).select(
        "n", _initial_symbols().alias("syms")
    ).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            words.select("n", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy("p.left", "p.right")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0].cnt <= 0:
            break
        left, right, cnt = top[0].left, top[0].right, int(top[0].cnt)
        merges.append((left, right, cnt))
        words = words.select(
            "n", _apply_merge(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint()
    return merges


def bpe_segment(documents: DataFrame, merges: list[tuple[str, str, int]],
                text_col: str = "text") -> DataFrame:
    """Tokenize with a learned merge table: per doc, per word, replay
    the merges in learned order (each one codegen'd fold — no Python).
    Emits doc_id, n_words, n_tokens, fertility (tokens/word)."""
    toks = documents.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("word"),
    ).filter(F.col("word") != "").select("doc_id", _initial_symbols().alias("syms"))
    for left, right, _ in merges:
        toks = toks.select("doc_id", _apply_merge(F.col("syms"), left, right).alias("syms"))
    return (
        toks.select("doc_id", F.size("syms").alias("k"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("k").alias("n_tokens"),
        )
        .withColumn(
            "fertility",
            F.round(F.col("n_tokens") / F.col("n_words"), 6),
        )
    )
