"""Unigram tokenizer trainer: distributed EM == sequential EM, plus
the algebraic properties the algorithm guarantees.

The distributed surface is pinned the way pca/bpe are: a sequential
pure-Python reference computes the same seed → E-step → M-step on a
tiny corpus and the Spark path must match it exactly (expected counts
aggregate as per-word-rounded decimal sums, so the distributed total
is bit-deterministic and equal to the sequential sum of the same
rounded partials).
"""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import Row

from aws_data_pipeline_ads_spark.operators import unigram_tok as U


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string")


# -- sequential reference ----------------------------------------------------

def _seq_word_counts(texts):
    c = Counter()
    for t in texts:
        for w in t.lower().strip().split():
            if w:
                c[w] += 1
    return c


def _seq_seed(wc, max_len, max_seed):
    subs = Counter()
    for w, n in wc.items():
        for j in range(len(w)):
            for ln in range(2, min(max_len, len(w) - j) + 1):
                subs[w[j:j + ln]] += n
    top = sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))[:max_seed]
    weights = {}
    for w, n in wc.items():
        for ch in w:
            weights[ch] = weights.get(ch, 0.0) + n
    for p, wgt in top:
        weights.setdefault(p, float(wgt))
    total = sum(weights.values())
    return {p: math.log(v / total) for p, v in weights.items()}


def _seq_e_step(wc, logp, max_len):
    """Sequential E-step over the SAME 12-decimal per-word rounding the
    distributed path uses, so sums are exactly comparable."""
    from decimal import Decimal

    counts: dict[str, Decimal] = {}
    ll = Decimal(0)
    for w, n in wc.items():
        e, z = U._forward_backward(w, logp, max_len)
        if z == float("-inf"):
            continue
        for p, v in e.items():
            counts[p] = counts.get(p, Decimal(0)) + Decimal(f"{v * n:.12f}")
        ll += Decimal(f"{z * n:.12f}")
    return {p: float(v) for p, v in counts.items()}, float(ll)


TEXTS = ["the cat sat on the mat",
         "the cats sat", "a cat on a mat", "the the the"]


def test_distributed_e_step_matches_sequential(spark):
    docs = _docs(spark, TEXTS)
    wc = _seq_word_counts(TEXTS)
    words = U.word_counts(docs)
    got_wc = {r["word"]: r["n"] for r in words.collect()}
    assert got_wc == dict(wc)

    logp = U.seed_vocab(words, max_len=4, max_seed=50)
    ref_logp = _seq_seed(wc, max_len=4, max_seed=50)
    assert logp == pytest.approx(ref_logp)
    assert set(logp) == set(ref_logp)

    counts, ll = U._e_step(spark, words, logp, max_len=4)
    ref_counts, ref_ll = _seq_e_step(wc, logp, max_len=4)
    assert ll == pytest.approx(ref_ll, abs=1e-9)
    assert set(counts) == set(ref_counts)
    for p in ref_counts:
        assert counts[p] == pytest.approx(ref_counts[p], abs=1e-9), p


def test_forward_backward_hand_computed():
    """2-char word, full lattice: expected counts match the closed
    form. Vocab {a, b, ab}: segmentations 'a b' (p_a·p_b) and 'ab'
    (p_ab); E[ab] = p_ab / (p_ab + p_a·p_b) etc."""
    import math as m

    pa, pb, pab = 0.2, 0.3, 0.1
    logp = {"a": m.log(pa), "b": m.log(pb), "ab": m.log(pab)}
    e, z = U._forward_backward("ab", logp, max_len=2)
    z_true = pab + pa * pb
    assert m.exp(z) == pytest.approx(z_true)
    assert e["ab"] == pytest.approx(pab / z_true)
    assert e["a"] == pytest.approx(pa * pb / z_true)
    assert e["b"] == pytest.approx(pa * pb / z_true)


def test_em_likelihood_non_decreasing(spark):
    """The EM guarantee: corpus log-likelihood never decreases across
    M-steps over a fixed vocabulary."""
    docs = _docs(spark, TEXTS)
    words = U.word_counts(docs)
    logp = U.seed_vocab(words, max_len=4, max_seed=50)
    lls = []
    for _ in range(3):
        counts, ll = U._e_step(spark, words, logp, max_len=4)
        lls.append(ll)
        total = sum(counts.values())
        floor = math.log(0.5 / total)
        logp = {p: (math.log(c / total) if (c := counts.get(p, 0.0)) > 0
                    else floor) for p in logp}
    assert lls == sorted(lls), lls


def test_train_reaches_target_and_keeps_coverage(spark):
    docs = _docs(spark, TEXTS)
    vocab = U.unigram_train(docs, vocab_size=24, max_len=4,
                            max_seed=60, em_rounds=1)
    pieces = {p for p, _ in vocab}
    assert len(vocab) <= 24
    # every character of the corpus is a piece (coverage floor)
    chars = {c for t in TEXTS for c in t.lower() if not c.isspace()}
    assert chars <= pieces
    # probabilities normalize (within the rounding the dec-sums carry)
    assert sum(math.exp(lp) for _, lp in vocab) == pytest.approx(1.0,
                                                                 abs=1e-6)


def test_viterbi_prefers_high_probability_split():
    lp = {"un": math.log(0.3), "related": math.log(0.3),
          "u": math.log(0.01), "n": math.log(0.01), "r": math.log(0.01),
          "e": math.log(0.01), "l": math.log(0.01), "a": math.log(0.01),
          "t": math.log(0.01), "d": math.log(0.01)}
    assert U._viterbi("unrelated", lp, 7, -50.0) == ["un", "related"]
    # unknown characters fall back to single-char unk pieces
    assert U._viterbi("un!", lp, 7, -50.0) == ["un", "!"]


def test_segment_documents_end_to_end(spark):
    docs = _docs(spark, TEXTS)
    vocab = U.unigram_train(docs, vocab_size=30, max_len=4,
                            max_seed=60, em_rounds=1)
    out = {r["doc_id"]: r for r in U.unigram_segment(docs, vocab).collect()}
    assert len(out) == len(TEXTS)
    for i, t in enumerate(TEXTS):
        n_words = len(t.split())
        r = out[i]
        assert r["n_words"] == n_words
        # a word splits into >=1 pieces; fertility bounded by chars
        assert n_words <= r["n_pieces"] <= sum(len(w) for w in t.split())
        # the preview re-joins to a prefix of the lowercased text's
        # character stream (segmentation is lossless per word)
        joined = r["pieces_preview"].replace("▁", "")
        assert joined == t.lower().replace(" ", "")[:len(joined)]


def test_determinism_across_partitionings(spark):
    """Same corpus, different partition counts → identical vocab and
    log-probs (the decimal-sum aggregation contract)."""
    d1 = _docs(spark, TEXTS).repartition(1)
    d2 = _docs(spark, TEXTS).repartition(7)
    v1 = U.unigram_train(d1, vocab_size=24, max_len=4, max_seed=60,
                         em_rounds=1)
    v2 = U.unigram_train(d2, vocab_size=24, max_len=4, max_seed=60,
                         em_rounds=1)
    assert v1 == v2
