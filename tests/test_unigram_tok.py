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


def test_loo_loss_formula_hand_computed():
    """SentencePiece §3.2 LOO loss, closed form on a 3-piece vocab:
    removing 'ab' re-routes its freq onto its best alternative
    ['a','b']; loss = f·[(ln f − ln S) − Σ_alt (ln(f_a+f) − ln S_alt)]."""
    counts = {"a": 4.0, "b": 2.0, "ab": 3.0}
    logp = {p: math.log(c / 9.0) for p, c in counts.items()}
    losses = U._loo_losses(logp, counts, max_len=2)
    s, f = 9.0, 3.0
    s_alt = s + f * (2 - 1)
    expect = f * ((math.log(f) - math.log(s))
                  - ((math.log(4 + f) - math.log(s_alt))
                     + (math.log(2 + f) - math.log(s_alt))))
    assert set(losses) == {"ab"}  # single chars are never candidates
    assert losses["ab"] == pytest.approx(expect)


def test_loo_zero_count_piece_is_free_to_prune():
    counts = {"a": 4.0, "b": 2.0, "ab": 0.0}
    logp = {"a": math.log(0.6), "b": math.log(0.3), "ab": math.log(0.1)}
    losses = U._loo_losses(logp, counts, max_len=2)
    assert losses["ab"] == float("-inf")


def test_loo_vs_count_criteria(spark):
    """The r8 docstring called count-pruning a 'simplification'; this
    measures the two criteria against each other on the same corpus.
    MEASURED: on this corpus AND on sf0.001 documents at the registry
    config (vocab_size=256, max_len=5, max_seed=1500) the two criteria
    converge to the IDENTICAL vocabulary (Jaccard 1.0). The assertion
    pins an agreement floor rather than equality so a corpus where LOO
    genuinely re-ranks borderline pieces still passes while a ranking
    bug (inverted sort, wrong alternative mass) fails."""
    docs = _docs(spark, TEXTS)
    v_loo = U.unigram_train(docs, vocab_size=24, max_len=4, max_seed=60,
                            em_rounds=1, prune_criterion="loo")
    v_cnt = U.unigram_train(docs, vocab_size=24, max_len=4, max_seed=60,
                            em_rounds=1, prune_criterion="count")
    p_loo, p_cnt = {p for p, _ in v_loo}, {p for p, _ in v_cnt}
    chars = {c for t in TEXTS for c in t.lower() if not c.isspace()}
    assert chars <= p_loo and chars <= p_cnt
    assert len(v_loo) <= 24 and len(v_cnt) <= 24
    jacc = len(p_loo & p_cnt) / len(p_loo | p_cnt)
    assert jacc >= 0.5, (sorted(p_loo - p_cnt), sorted(p_cnt - p_loo))
    with pytest.raises(ValueError, match="prune_criterion"):
        U.unigram_train(docs, prune_criterion="nope")


def test_viterbi_equal_cost_is_min_pieces():
    """With every vocab piece at the SAME log-prob (and unk strictly
    worse), Viterbi's max-probability split is exactly the MIN-PIECE
    segmentation — checked against a brute-force DP, including
    self-overlap runs and pieces meeting at a boundary."""
    lp = {"th": -1.0, "er": -1.0}

    def brute_min_pieces(w):
        n = len(w)
        best = [0] + [10 ** 9] * n
        for i in range(1, n + 1):
            best[i] = best[i - 1] + 1                       # single char
            for p in ("th", "er"):
                if i >= 2 and w[i - 2:i] == p:
                    best[i] = min(best[i], best[i - 2] + 1)
        return best[n]

    for w in ("thth", "tht", "ththt", "ether", "therer", "eth", "the",
              "xthxerx", "terh", "thert", "erth", "x"):
        got = U._viterbi(w, lp, 2, -12.0)
        assert "".join(got) == w                            # lossless
        assert len(got) == brute_min_pieces(w), w


def test_segment_losslessness_and_unk_columns(spark):
    """n_chars must re-cover every word character (Σ|piece|) and n_unk
    counts exactly the out-of-vocab single-char fallbacks."""
    docs = _docs(spark, TEXTS)
    vocab = U.unigram_train(docs, vocab_size=30, max_len=4,
                            max_seed=60, em_rounds=1)
    for r in U.unigram_segment(docs, vocab).collect():
        t = TEXTS[r["doc_id"]]
        assert r["n_chars"] == sum(len(w) for w in t.lower().split())
        assert r["n_unk"] == 0  # full single-char coverage
    # a vocab missing most chars: every uncovered char is one unk
    tiny = _docs(spark, ["th x yth"])
    out = U.unigram_segment(tiny, [("th", -1.0)]).collect()[0]
    assert (out["n_pieces"], out["n_words"]) == (4, 3)  # th | x | y+th
    assert out["n_chars"] == 6
    assert out["n_unk"] == 2                            # 'x' and 'y'


def test_seed_score_criteria(spark):
    """Seeding vs SentencePiece's ESA, measured (r9 verdict task 7):
    the ESA is an enumeration device — with the max_len cap our
    explicit enumeration yields the identical candidate universe, so
    the only live difference is the top-k ranking score (freq vs
    SentencePiece's freq×len). MEASURED: on this corpus AND on sf0.001
    documents at the registry config (vocab_size=256, max_len=5,
    max_seed=1500, em_rounds=1) the two seedings train to the
    IDENTICAL (piece, logp) vocabulary — EM + LOO pruning decide the
    survivors, not the seed ranking. The assertion pins an agreement
    floor rather than equality so a corpus where the rankings
    genuinely admit different borderline seeds still passes while a
    scoring bug (wrong rank column, inverted sort) fails."""
    docs = _docs(spark, TEXTS)
    kw = dict(vocab_size=24, max_len=4, max_seed=60, em_rounds=1)
    v_f = U.unigram_train(docs, seed_score="freq", **kw)
    v_l = U.unigram_train(docs, seed_score="freq_len", **kw)
    p_f, p_l = {p for p, _ in v_f}, {p for p, _ in v_l}
    chars = {c for t in TEXTS for c in t.lower() if not c.isspace()}
    assert chars <= p_f and chars <= p_l
    jacc = len(p_f & p_l) / len(p_f | p_l)
    assert jacc >= 0.5, (sorted(p_f - p_l), sorted(p_l - p_f))
    with pytest.raises(ValueError, match="seed_score"):
        U.unigram_train(docs, seed_score="nope")
