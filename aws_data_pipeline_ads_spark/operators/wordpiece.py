"""WordPiece tokenizer TRAINING + greedy encoding, as Spark jobs.

Completes the tokenizer-family trilogy next to bpe.py (Sennrich merges)
and unigram_tok.py (SentencePiece-unigram EM): WordPiece is the BERT
vocabulary algorithm (Schuster & Nakajima 2012; the HuggingFace
`tokenizers` WordPiece trainer is the industrial reference). Same
greedy-merge loop as BPE but the round argmax maximizes the LIKELIHOOD
ratio score

    score(a, b) = count(ab) / (count(a) * count(b))

— merging the pair whose fusion most increases corpus likelihood under
a unigram model, not the raw count. Encoding is greedy
longest-match-first with `##` continuation prefixes.

Scale shape (bpe.py's, unchanged — the reason this survives 100 TB):
- Training runs on the DISTINCT-WORD (word, n) table: one corpus-scale
  exchange, then everything is vocabulary-scale (Zipf-capped).
- Each round is TWO map-side-combined aggregates over that table (pair
  counts + symbol counts), one broadcast join pair→symbol-count, and a
  1-ROW argmax collect. The chosen pair folds back as a LITERAL into a
  codegen'd aggregate (no Python in the merge), lineage cut per round
  with localCheckpoint.
- Encoding is one Arrow-batched map with the vocab broadcast once and
  a per-partition distinct-word memo; only doc_id + counts shuffle.

Determinism: score ties break lexicographically on (left, right) —
stable across partitionings and engines (the same contract the
q_wordpiece_vocab DuckDB oracle replays for round 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_data_pipeline_ads_spark.operators.bpe import (
    _apply_merge,
    word_counts,
)

CONT = "##"  # continuation prefix (BERT convention)
UNK = "[UNK]"


def _initial_symbols() -> F.Column:
    """word → [c1, ##c2, ##c3, ...] — first char bare, the rest
    continuation-prefixed (the WordPiece initial alphabet)."""
    chars = F.split(F.col("word"), "")
    return F.concat(
        F.slice(chars, 1, 1),
        F.transform(
            F.slice(chars, 2, F.size(chars) - 1),
            lambda c: F.concat(F.lit(CONT), c),
        ),
    )


def _adjacent_pairs(syms) -> F.Column:
    n = F.size(syms)
    return F.zip_with(
        F.slice(syms, 1, n - 1),
        F.slice(syms, 2, n - 1),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )


def wordpiece_train(documents: DataFrame, n_merges: int = 8,
                    text_col: str = "text"
                    ) -> tuple[list[str], list[tuple[str, str, float]]]:
    """Learn `n_merges` WordPiece merges; returns (vocab, merges) where
    vocab = sorted initial alphabet + merged tokens in merge order and
    merges = [(left, right, score)]. Driver traffic: ONE row per round
    (the argmax) plus the alphabet (corpus character set — bounded).

    The merged token glues the right symbol's chars onto the left
    (dropping the right's ## prefix — it is interior by construction),
    so '##e'+'##r' → '##er' and 'w'+'##or' → 'wor', exactly the HF
    trainer's continuing_subword_prefix bookkeeping."""
    words = word_counts(documents, text_col).select(
        "n", _initial_symbols().alias("syms")
    ).localCheckpoint()
    alphabet = sorted(
        r.s for r in words.select(
            F.explode("syms").alias("s")).distinct().collect())
    merges: list[tuple[str, str, float]] = []
    vocab = list(alphabet)
    for _ in range(n_merges):
        pairs = (
            words.select("n",
                         F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy("p.left", "p.right")
            .agg(F.sum("n").alias("pn"))
        )
        symc = (
            words.select("n", F.explode("syms").alias("s"))
            .groupBy("s")
            .agg(F.sum("n").alias("c"))
        )
        top = (
            pairs
            .join(F.broadcast(symc.withColumnsRenamed(
                {"s": "left", "c": "lc"})), "left")
            .join(F.broadcast(symc.withColumnsRenamed(
                {"s": "right", "c": "rc"})), "right")
            # one double division of exact integer counts: bit-exact
            # cross-engine (the oracle recomputes round 0 identically)
            .select("left", "right", "pn",
                    (F.col("pn").cast("double")
                     / (F.col("lc") * F.col("rc")).cast("double")
                     ).alias("score"))
            .orderBy(F.desc("score"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0].pn <= 0:
            break
        left, right, score = top[0].left, top[0].right, float(top[0].score)
        merged = left + right[len(CONT):]
        merges.append((left, right, score))
        vocab.append(merged)
        words = words.select(
            "n", _apply_merge(F.col("syms"), left, right,
                              merged=merged).alias("syms")
        ).localCheckpoint()
    return vocab, merges


def _greedy(word: str, vocab: set, max_len: int) -> list[str]:
    """HF WordPiece greedy longest-match-first: at each position take
    the longest vocab entry (## form when interior); if NO prefix
    matches, the WHOLE word becomes [UNK] (the BERT rule — a partial
    segmentation is discarded, not patched)."""
    out: list[str] = []
    i, n = 0, len(word)
    while i < n:
        end = min(n, i + max_len)
        piece = None
        while end > i:
            cand = word[i:end]
            if i > 0:
                cand = CONT + cand
            if cand in vocab:
                piece = cand
                break
            end -= 1
        if piece is None:
            return [UNK]
        out.append(piece)
        i = end
    return out


def wordpiece_encode(documents: DataFrame, vocab: list[str],
                     text_col: str = "text",
                     doc_id_col: str = "doc_id") -> DataFrame:
    """Greedy-encode each document with a trained vocab: one row per
    doc with piece/word/char/unk counts and a capped preview. Arrow-
    batched; the vocab travels once as a broadcast, pieces never
    shuffle. `n_chars` counts the characters the pieces RE-COVER
    (## prefixes excluded; an [UNK] covers its whole word) — the
    losslessness witness the oracle checks corpus-wide."""
    spark = documents.sparkSession
    vset = set(vocab)
    max_len = max((len(v) - len(CONT) if v.startswith(CONT) else len(v)
                   for v in vset), default=1)
    bv = spark.sparkContext.broadcast((vset, max_len))

    schema = T.StructType([
        T.StructField(doc_id_col, T.LongType()),
        T.StructField("n_pieces", T.LongType()),
        T.StructField("n_words", T.LongType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("n_unk", T.LongType()),
        T.StructField("pieces_preview", T.StringType()),
    ])

    def run(it):
        import pandas as pd

        vs, ml = bv.value
        memo: dict[str, list[str]] = {}
        for pdf in it:
            # NULL text must vanish like the SQL twin's unnest-of-NULL
            # (str(None) would tokenize the literal word 'none')
            pdf = pdf[pdf[text_col].notna()]
            ids, nps, nws, ncs, nus, prevs = [], [], [], [], [], []
            for did, text in zip(pdf[doc_id_col], pdf[text_col]):
                ws = [w for w in str(text).lower().strip().split() if w]
                pieces: list[str] = []
                covered = 0
                unks = 0
                for w in ws:
                    seg = memo.get(w)
                    if seg is None:
                        seg = memo[w] = _greedy(w, vs, ml)
                    pieces += seg
                    if seg == [UNK]:
                        unks += 1
                        covered += len(w)
                    else:
                        # positional accounting, not prefix-sniffing:
                        # the FIRST piece is always the raw prefix of
                        # the word (a word literally starting with
                        # '##' greedy-matches a continuation token
                        # verbatim — HF behaves the same — and its ##
                        # chars are real coverage); every later piece
                        # is CONT-prefixed by construction
                        covered += sum(
                            len(p) if i == 0 else len(p) - len(CONT)
                            for i, p in enumerate(seg))
                ids.append(did)
                nps.append(len(pieces))
                nws.append(len(ws))
                ncs.append(covered)
                nus.append(unks)
                prevs.append("▁".join(pieces[:12]))
            yield pd.DataFrame({doc_id_col: ids, "n_pieces": nps,
                                "n_words": nws, "n_chars": ncs,
                                "n_unk": nus, "pieces_preview": prevs})

    return documents.select(doc_id_col, text_col).mapInPandas(run, schema)
