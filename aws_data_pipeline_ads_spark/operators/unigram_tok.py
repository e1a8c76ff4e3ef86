"""SentencePiece-style UNIGRAM tokenizer training (Kudo 2018), as
distributed EM over the distinct-word table.

bpe.py learns a merge table (Sennrich 2016); this is the OTHER
industrial subword family — the unigram language model tokenizer
SentencePiece/T5/ALBERT vocabularies are built with: seed a large
candidate vocabulary, run EM to fit piece probabilities (each word is
a lattice of segmentations; E-step = forward-backward expected piece
counts, M-step = renormalize), then iteratively shrink to the target
size. Segmentation at inference is Viterbi (max-probability split).

Scale shape — same posture as bpe.py:
- Everything trains on the DISTINCT-WORD table (word, count): one
  corpus-scale exchange builds it, Zipf caps its size at vocabulary
  scale. E-steps never rescan the corpus.
- The E-step is an Arrow-batched mapInPandas over that word table
  (lattice forward-backward per word, pure per-row Python over
  vocab-scale rows — no corpus-scale Python), emitting (piece,
  expected_count · word_count) pairs.
- Expected counts aggregate as DECIMAL(38,12) sums of per-word-rounded
  partials: exact and order-independent under any partitioning, so
  training is bit-deterministic across cluster layouts (the repo's
  dec-sum convention; float sums would drift with partition order).
- The M-step and pruning see only the piece table (≤ seed size) on
  the driver — the same bounded-collect class as BPE's 1-row argmax
  or IVF's centroid table.

Pruning uses SentencePiece §3.2's leave-one-out likelihood criterion
by default (prune_criterion="loo"): each piece's loss is the corpus
log-likelihood drop when the piece is removed and its expected
frequency re-routes to its best alternative segmentation — computed
driver-side on the vocab-scale piece table (one short-string Viterbi
per candidate), exactly where SentencePiece computes it. The cheaper
expected-count ranking remains available (prune_criterion="count");
tests/test_unigram_tok.py measures how far the two criteria's
vocabularies actually diverge on testdata.

Seeding vs SentencePiece's ESA — a MEASURED equivalence, not a
simplification (r10): the Enhanced Suffix Array only ENUMERATES
frequent substrings efficiently; with the max_len cap, seed_vocab's
explicit enumeration produces the identical candidate universe,
leaving the top-k ranking score as the sole difference. Both scores
are implemented (seed_score="freq" | "freq_len", the latter
SentencePiece's frequency×length), and on sf0.001 documents at the
registry config the two seedings train to the IDENTICAL (piece, logp)
vocabulary (test_seed_score_criteria) — EM + LOO pruning, not the
seed ranking, decide the survivors. Single-character pieces are never
pruned, which guarantees every training word stays segmentable (full
coverage).

Determinism: all ties break lexicographically on the piece string.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_data_pipeline_ads_spark.operators.bpe import word_counts

_DEC = "decimal(38,12)"
_NEG_INF = float("-inf")


# -- lattice primitives (pure Python, per word — vocab-scale rows) ----------

def _log_add(a: float, b: float) -> float:
    if a == _NEG_INF:
        return b
    if b == _NEG_INF:
        return a
    hi, lo = (a, b) if a > b else (b, a)
    return hi + math.log1p(math.exp(lo - hi))


def _forward_backward(word: str, logp: dict[str, float],
                      max_len: int) -> tuple[dict[str, float], float]:
    """Expected piece counts for one word's segmentation lattice and
    the word's total log-likelihood (log Z). Standard forward-backward:
    E[piece at (j,i)] = exp(alpha_j + logp + beta_i - log Z)."""
    n = len(word)
    spans = []  # (j, i, piece, logp)
    for j in range(n):
        for i in range(j + 1, min(j + max_len, n) + 1):
            p = word[j:i]
            lp = logp.get(p)
            if lp is not None:
                spans.append((j, i, p, lp))
    alpha = [_NEG_INF] * (n + 1)
    beta = [_NEG_INF] * (n + 1)
    alpha[0] = 0.0
    beta[n] = 0.0
    for j, i, _p, lp in spans:  # spans are in increasing j: alpha ok
        alpha[i] = _log_add(alpha[i], alpha[j] + lp)
    for j, i, _p, lp in reversed(spans):
        beta[j] = _log_add(beta[j], lp + beta[i])
    z = alpha[n]
    if z == _NEG_INF:
        # unsegmentable (a char fell out of the vocab) — contributes
        # nothing; cannot happen while single chars are kept
        return {}, _NEG_INF
    out: dict[str, float] = {}
    for j, i, p, lp in spans:
        e = math.exp(alpha[j] + lp + beta[i] - z)
        if e > 0.0:
            out[p] = out.get(p, 0.0) + e
    return out, z


def _viterbi(word: str, logp: dict[str, float],
             max_len: int, unk_logp: float) -> list[str]:
    """Max-probability segmentation. Ties prefer the LONGER last piece
    (then lexicographic) — deterministic across engines. Characters
    outside the vocab segment as single-char unknowns at unk_logp."""
    n = len(word)
    best = [(_NEG_INF, "")] * (n + 1)
    best[0] = (0.0, "")
    back: list[tuple[int, str]] = [(-1, "")] * (n + 1)
    for i in range(1, n + 1):
        cand = []
        for j in range(max(0, i - max_len), i):
            if best[j][0] == _NEG_INF:
                continue
            p = word[j:i]
            lp = logp.get(p)
            if lp is None and i - j == 1:
                lp = unk_logp
            if lp is None:
                continue
            cand.append((best[j][0] + lp, len(p), p, j))
        if cand:
            cand.sort(key=lambda c: (-c[0], -c[1], c[2]))
            score, _ln, p, j = cand[0]
            best[i] = (score, p)
            back[i] = (j, p)
    pieces: list[str] = []
    i = n
    while i > 0:
        j, p = back[i]
        if j < 0:  # unreachable while single chars stay in the vocab
            return [word]
        pieces.append(p)
        i = j
    return pieces[::-1]


# -- distributed training ----------------------------------------------------

def seed_vocab(words: DataFrame, max_len: int = 6,
               max_seed: int = 2000,
               seed_score: str = "freq") -> dict[str, float]:
    """Initial piece log-probs: the top `max_seed` substrings (length
    2..max_len) of the distinct-word table, PLUS every single
    character (coverage floor). One vocab-scale explode + one
    map-side-combined count shuffle; the TakeOrdered top-k is the only
    driver traffic.

    Relation to SentencePiece's ESA seeding: the Enhanced Suffix Array
    is an ENUMERATION device for frequent substrings of unbounded
    length — with the max_len cap this explicit enumeration yields the
    IDENTICAL candidate universe, so the only live difference is the
    top-k ranking score. `seed_score`: "freq" ranks by
    frequency-weighted occurrence; "freq_len" by frequency × length
    (SentencePiece's candidate score). Measured
    (tests/test_unigram_tok.py::test_seed_score_criteria; sf0.001
    documents at the registry config, vocab_size=256 max_len=5
    max_seed=1500 em_rounds=1): the two seedings train to the
    IDENTICAL vocabulary — EM + pruning, not the seed ranking, decide
    the survivors. Initial log-probs weight by frequency under both
    scores (SentencePiece seeds probabilities from frequency too)."""
    if seed_score not in ("freq", "freq_len"):
        raise ValueError(f"unknown seed_score {seed_score!r}")
    # guard the inner range: sequence(2, 1) DESCENDS in Spark, so a
    # start position with <2 chars left must yield an empty array, not
    # a clamped duplicate of the single char
    subs = words.select(
        F.explode(
            F.flatten(F.expr(
                f"""transform(sequence(1, length(word)), j ->
                    CASE WHEN length(word) - j + 1 >= 2 THEN
                      transform(sequence(2, least({max_len},
                                         length(word) - j + 1)), l ->
                          substring(word, j, l))
                    ELSE array() END)"""
            ))
        ).alias("piece"),
        F.col("n"),
    ).groupBy("piece").agg(F.sum("n").alias("w"))
    rank = (F.col("w") * F.length("piece") if seed_score == "freq_len"
            else F.col("w"))
    top = (
        subs.orderBy(rank.desc(), F.col("piece"))
        .limit(max_seed).collect()
    )
    chars = (
        words.select(F.explode(F.split("word", "")).alias("piece"), "n")
        .filter(F.col("piece") != "")
        .groupBy("piece").agg(F.sum("n").alias("w")).collect()
    )
    weights: dict[str, float] = {}
    for r in chars:
        weights[r["piece"]] = float(r["w"])
    for r in top:
        weights.setdefault(r["piece"], float(r["w"]))
    total = sum(weights.values())
    return {p: math.log(w / total) for p, w in weights.items()}


_E_SCHEMA = T.StructType([
    T.StructField("piece", T.StringType()),
    T.StructField("e", T.StringType()),     # decimal-string partial
    T.StructField("ll", T.StringType()),    # per-word loglik partial
])


def _e_step(spark, words: DataFrame, logp: dict[str, float],
            max_len: int) -> tuple[dict[str, float], float]:
    """One distributed E-step: (expected count per piece, corpus
    log-likelihood). Per-word partials round to 12 decimals and
    aggregate as decimal sums — exact, order-independent."""
    blogp = spark.sparkContext.broadcast(logp)

    def run(it):
        import pandas as pd

        for pdf in it:
            lp = blogp.value
            pieces, es, lls = [], [], []
            for word, n in zip(pdf["word"], pdf["n"]):
                exp_counts, z = _forward_backward(str(word), lp, max_len)
                if z == _NEG_INF:
                    continue
                for p, e in exp_counts.items():
                    pieces.append(p)
                    es.append(f"{e * int(n):.12f}")
                    lls.append(None)
                pieces.append("")            # loglik carrier row
                es.append(None)
                lls.append(f"{z * int(n):.12f}")
            yield pd.DataFrame({"piece": pieces, "e": es, "ll": lls})

    agg = (
        words.select("word", "n").mapInPandas(run, _E_SCHEMA)
        .groupBy("piece")
        .agg(F.sum(F.col("e").cast(_DEC)).alias("e"),
             F.sum(F.col("ll").cast(_DEC)).alias("ll"))
        .collect()
    )
    counts: dict[str, float] = {}
    loglik = 0.0
    for r in agg:
        if r["piece"] == "":
            loglik = float(r["ll"])
        elif r["e"] is not None:
            counts[r["piece"]] = float(r["e"])
    return counts, loglik


def _loo_losses(logp: dict[str, float], counts: dict[str, float],
                max_len: int) -> dict[str, float]:
    """Leave-one-out likelihood loss per multi-char piece
    (SentencePiece §3.2, unigram_model_trainer PruneSentencePieces):
    removing piece p re-routes its expected frequency freq(p) onto p's
    best ALTERNATIVE segmentation under the remaining vocab, and the
    corpus log-likelihood drops by

        loss(p) = freq(p) · [ (log freq(p) − log S)
                  − Σ_{a ∈ alt(p)} (log(freq(a)+freq(p)) − log S_alt) ]

    with S = Σ freq and S_alt = S + freq(p)·(|alt(p)|−1). Driver-side
    and vocab-scale: one Viterbi over the piece STRING per candidate,
    never a corpus pass. A piece with zero expected count has -inf
    loss (removing it costs nothing — pruned first)."""
    total = sum(counts.values())
    unk = min(logp.values()) - 10.0
    log_s = math.log(total)
    lp = dict(logp)
    losses: dict[str, float] = {}
    for p in logp:
        if len(p) == 1:
            continue
        freq = counts.get(p, 0.0)
        if freq <= 0.0:
            losses[p] = _NEG_INF
            continue
        saved = lp.pop(p)
        alt = _viterbi(p, lp, max_len, unk)
        lp[p] = saved
        log_s_alt = math.log(total + freq * (len(alt) - 1))
        logprob_alt = sum(
            math.log(counts.get(a, 0.0) + freq) - log_s_alt for a in alt)
        losses[p] = freq * ((math.log(freq) - log_s) - logprob_alt)
    return losses


def unigram_train(documents: DataFrame, vocab_size: int = 512,
                  text_col: str = "text", max_len: int = 6,
                  max_seed: int = 2000, em_rounds: int = 2,
                  shrink: float = 0.75,
                  prune_criterion: str = "loo",
                  seed_score: str = "freq") -> list[tuple[str, float]]:
    """Train a unigram tokenizer on the corpus: seed → (EM ×
    em_rounds → prune to max(vocab_size, |V|·shrink)) until the vocab
    reaches vocab_size. Returns [(piece, logp)] sorted by -logp then
    piece. Single-char pieces are never pruned (coverage).

    prune_criterion: "loo" (default) ranks pieces by SentencePiece
    §3.2's leave-one-out likelihood loss; "count" ranks by expected
    count. Measured (tests/test_unigram_tok.py::
    test_loo_vs_count_criteria; sf0.001 documents at the registry
    config): the two criteria converge to the IDENTICAL vocabulary on
    testdata — the assertion pins an agreement floor so a corpus where
    they genuinely diverge still passes while a ranking bug fails."""
    if prune_criterion not in ("loo", "count"):
        raise ValueError(f"unknown prune_criterion {prune_criterion!r}")
    spark = documents.sparkSession
    words = word_counts(documents, text_col).localCheckpoint()
    logp = seed_vocab(words, max_len, max_seed, seed_score)
    counts: dict[str, float] = {}
    while True:
        for _ in range(em_rounds):
            counts, _ll = _e_step(spark, words, logp, max_len)
            total = sum(counts.values())
            # pieces with zero expected count keep a floor so single
            # chars never drop out of the dict entirely
            floor = math.log(0.5 / total)
            logp = {p: (math.log(c / total) if (c := counts.get(p, 0.0)) > 0
                        else floor)
                    for p in logp}
        if len(logp) <= vocab_size:
            break
        keep = max(vocab_size, int(len(logp) * shrink))
        if prune_criterion == "loo":
            losses = _loo_losses(logp, counts, max_len)
            rank = lambda kv: (-losses[kv[0]], kv[0])  # noqa: E731
        else:
            rank = lambda kv: (-kv[1], kv[0])  # noqa: E731
        multi = sorted(
            ((p, lp) for p, lp in logp.items() if len(p) > 1), key=rank)
        singles = {p: lp for p, lp in logp.items() if len(p) == 1}
        n_multi = max(0, keep - len(singles))
        logp = dict(multi[:n_multi]) | singles
        if len(singles) >= keep:
            break  # cannot shrink below the coverage floor
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


def unigram_segment(documents: DataFrame, vocab: list[tuple[str, float]],
                    text_col: str = "text",
                    doc_id_col: str = "doc_id") -> DataFrame:
    """Viterbi-segment each document with a trained vocab: one row per
    doc with the piece sequence and counts. Arrow-batched; the vocab
    travels once as a broadcast, pieces never shuffle (output is
    doc_id + counts + a capped preview)."""
    spark = documents.sparkSession
    logp = dict(vocab)
    max_len = max((len(p) for p in logp), default=1)
    unk = min(logp.values(), default=0.0) - 10.0
    blogp = spark.sparkContext.broadcast((logp, max_len, unk))

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

        lp, ml, ulp = blogp.value
        # Zipf: most word instances are repeats — memoize the DP per
        # distinct word across the whole partition (bounded by the
        # partition's vocabulary, not its token count)
        memo: dict[str, list[str]] = {}
        for pdf in it:
            # NULL text must vanish like the SQL twin's unnest-of-NULL
            # (str(None) would tokenize the literal word 'none')
            pdf = pdf[pdf[text_col].notna()]
            ids, nps, nws, ncs, nus, prevs = [], [], [], [], [], []
            for did, text in zip(pdf[doc_id_col], pdf[text_col]):
                ws = [w for w in str(text).lower().strip().split() if w]
                pieces: list[str] = []
                for w in ws:
                    seg = memo.get(w)
                    if seg is None:
                        seg = memo[w] = _viterbi(w, lp, ml, ulp)
                    pieces += seg
                ids.append(did)
                nps.append(len(pieces))
                nws.append(len(ws))
                # losslessness witness: Σ|piece| must re-cover every
                # word char; unk count is the coverage-health metric
                ncs.append(sum(len(p) for p in pieces))
                nus.append(sum(1 for p in pieces if p not in lp))
                prevs.append("▁".join(pieces[:12]))
            yield pd.DataFrame({doc_id_col: ids, "n_pieces": nps,
                                "n_words": nws, "n_chars": ncs,
                                "n_unk": nus, "pieces_preview": prevs})

    return documents.select(doc_id_col, text_col).mapInPandas(run, schema)
