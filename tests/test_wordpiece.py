"""WordPiece training + greedy encoding
(aws_data_pipeline_ads_spark/operators/wordpiece.py) — distributed
trainer vs a pure-Python reference, HF greedy-longest-match semantics,
losslessness/unk invariants on the corpus fixtures."""

from __future__ import annotations

from collections import Counter

import pytest

from aws_data_pipeline_ads_spark.catalog import load_table
from aws_data_pipeline_ads_spark.operators import wordpiece


def _ref_train(word_counts: dict[str, int], n_merges: int):
    """Pure-Python WordPiece trainer: likelihood-ratio score argmax,
    ties (score desc, left asc, right asc), ## continuation glue."""
    segs = {w: [w[0]] + ["##" + c for c in w[1:]] for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        sc: Counter = Counter()
        for w, n in word_counts.items():
            s = segs[w]
            for sym in s:
                sc[sym] += n
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += n
        if not pc:
            break
        best = min(pc, key=lambda p: (-(pc[p] / (sc[p[0]] * sc[p[1]])),
                                      p[0], p[1]))
        merges.append((best[0], best[1],
                       pc[best] / (sc[best[0]] * sc[best[1]])))
        merged = best[0] + best[1][2:]
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if (i + 1 < len(s) and s[i] == best[0]
                        and s[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges


def _word_counts(spark, sf_dir) -> dict[str, int]:
    docs = load_table(spark, sf_dir, "documents")
    wc: Counter = Counter()
    for r in docs.select("text").collect():
        for w in str(r.text).lower().strip().split():
            if w:
                wc[w] += 1
    return dict(wc)


def test_train_matches_reference_on_corpus(spark, sf_dir):
    """8 merges on the real fixture corpus: pair choices AND scores
    identical to the pure-Python trainer (the full-table twin the
    q_wordpiece_vocab round-0 oracle extends)."""
    docs = load_table(spark, sf_dir, "documents")
    vocab, merges = wordpiece.wordpiece_train(docs, n_merges=8)
    ref = _ref_train(_word_counts(spark, sf_dir), 8)
    assert [(l, r) for l, r, _ in merges] == [(l, r) for l, r, _ in ref]
    for (_, _, s1), (_, _, s2) in zip(merges, ref):
        assert s1 == pytest.approx(s2, abs=0, rel=1e-15)
    # vocab = alphabet + merged tokens in merge order
    alpha = [v for v in vocab if len(v.lstrip("#")) <= 1 or
             (not v.startswith("##") and len(v) == 1)]
    assert vocab[len(vocab) - len(merges):] == [
        l + r[2:] for l, r, _ in merges]


def test_greedy_longest_match_semantics(spark):
    """HF WordPiece rules on a hand vocab: longest prefix wins, ##
    continuation forms, and an unmatchable word becomes ONE [UNK]
    (never a partial segmentation)."""
    vocab = ["u", "##n", "##a", "##f", "##fa", "##ble",
             "un", "##aff", "##ffa", "b", "##l", "##e"]
    assert wordpiece._greedy("unaffable", set(vocab), 9) == [
        "un", "##aff", "##a", "##ble"]
    # no prefix of 'qqq' in vocab -> whole-word UNK
    assert wordpiece._greedy("qqq", set(vocab), 9) == [wordpiece.UNK]
    # interior failure also collapses the WHOLE word
    assert wordpiece._greedy("unq", set(vocab), 9) == [wordpiece.UNK]


def test_encode_invariants_on_corpus(spark, sf_dir):
    """Corpus-wide: zero unknowns (the alphabet is complete by
    construction), losslessness (pieces re-cover every character of
    every word), exact word counts."""
    docs = load_table(spark, sf_dir, "documents")
    vocab, _ = wordpiece.wordpiece_train(docs, n_merges=8)
    enc = wordpiece.wordpiece_encode(docs, vocab).collect()
    wc = _word_counts(spark, sf_dir)
    by_doc = {}
    for r in load_table(spark, sf_dir, "documents").select(
            "doc_id", "text").collect():
        ws = [w for w in str(r.text).lower().strip().split() if w]
        by_doc[r.doc_id] = (len(ws), sum(len(w) for w in ws))
    assert len(enc) == len(by_doc)
    for r in enc:
        nw, nc = by_doc[r.doc_id]
        assert r.n_words == nw
        assert r.n_chars == nc  # losslessness through ## bookkeeping
        assert r.n_unk == 0
        assert r.n_pieces >= nw  # a word is >= 1 piece


def test_encode_greedy_differs_from_bpe_shape(spark):
    """WordPiece greedy picks the LONGEST vocab prefix even when the
    merge order would have built it differently — pin one case."""
    docs = spark.createDataFrame([(0, "abc ab a")],
                                 "doc_id long, text string")
    vocab = ["a", "b", "c", "##a", "##b", "##c", "ab", "##bc", "abc"]
    out = wordpiece.wordpiece_encode(docs, vocab).collect()[0]
    # 'abc' -> ['abc'] (one piece), 'ab' -> ['ab'], 'a' -> ['a']
    assert out.n_pieces == 3
    assert out.n_unk == 0
    assert out.pieces_preview == "abc▁ab▁a"
