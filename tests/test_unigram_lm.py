"""Unigram-LM tokenizer (Kudo 2018): the E-step and Viterbi are
verified against brute-force enumeration of EVERY segmentation (a
genuinely independent formulation — no shared lattice code), and the
full distributed training schedule against an in-test single-threaded
reference trainer whose E-step IS that enumeration."""

import math

import pytest
from pyspark.sql import functions as F

from warctools_spark.operators.unigram_lm import (
    _estep_word,
    _viterbi_word,
    apply_unigram,
    unigram_seed,
    unigram_train,
)


def _enumerate_segs(word, logp, max_len, oov_logp=None):
    """All segmentations of word into vocab pieces (plus single-char
    OOV arcs when oov_logp is given), each with its path score."""
    segs = []

    def rec(i, cur, score):
        if i == len(word):
            segs.append((list(cur), score))
            return
        for k in range(i + 1, min(len(word), i + max_len) + 1):
            p = word[i:k]
            lp = logp.get(p)
            if lp is None and oov_logp is not None and k - i == 1:
                lp = oov_logp
            if lp is not None:
                cur.append(p)
                rec(k, cur, score + lp)
                cur.pop()

    rec(0, [], 0.0)
    return segs


def _brute_expected(word, logp, max_len):
    segs = _enumerate_segs(word, logp, max_len)
    if not segs:
        return {}
    weights = [math.exp(s) for _, s in segs]
    z = sum(weights)
    out = {}
    for (pieces, _), w in zip(segs, weights):
        for p in pieces:
            out[p] = out.get(p, 0.0) + w / z
    return out


def _brute_viterbi(word, logp, max_len, oov_logp):
    segs = _enumerate_segs(word, logp, max_len, oov_logp)
    if not segs:
        return []

    def splits(pieces):
        # split points right-to-left: the DP prefers the longest
        # LAST piece, recursively -> minimize this tuple
        pos, out = len(word), []
        for p in reversed(pieces):
            pos -= len(p)
            out.append(pos)
        return tuple(out)

    best = max(s for _, s in segs)
    tied = [p for p, s in segs if s == best]
    return min(tied, key=splits)


_MODEL = {
    "a": -2.0, "b": -2.5, "c": -3.0, "ab": -1.5,
    "bc": -1.8, "abc": -1.2, "aa": -2.2,
}


def test_estep_matches_bruteforce():
    for word in ["abc", "aab", "aaaa", "abcabc", "cab", "b"]:
        got = _estep_word(word, _MODEL, 3)
        want = _brute_expected(word, _MODEL, 3)
        assert set(got) == set(want), word
        for p in want:
            assert abs(got[p] - want[p]) < 1e-9, (word, p)


def test_estep_unreachable_word_is_empty():
    assert _estep_word("xyz", _MODEL, 3) == {}
    assert _estep_word("", _MODEL, 3) == {}


def test_viterbi_matches_bruteforce_including_ties():
    # uniform logps manufacture score ties at every length split
    flat = {p: -1.0 for p in ["a", "b", "ab", "ba", "aba", "bab"]}
    oov = min(flat.values()) - 10.0
    for model in (_MODEL, flat):
        m_oov = min(model.values()) - 10.0
        for word in ["abc", "abab", "ababa", "aaab", "xabc", "zz", ""]:
            got = _viterbi_word(word, model, 3, m_oov if model is _MODEL else oov)
            want = _brute_viterbi(
                word, model, 3, m_oov if model is _MODEL else oov
            )
            assert got == want, (word, model is flat)
            assert "".join(got) == word


def test_unigram_seed_chars_always_kept(spark):
    vocab = spark.createDataFrame(
        [("hello", 100), ("help", 50), ("zq", 1)], "token string, n long"
    )
    rows = {r.piece: r.c for r in unigram_seed(vocab, 4, seed_size=3).collect()}
    # top-3 multi-char by weighted count, plus EVERY single char
    for ch in "helopzq":
        assert ch in rows
    multi = [p for p in rows if len(p) > 1]
    assert len(multi) == 3
    assert "he" in multi and "el" in multi  # 150-weight bigrams


def _ref_train(
    word_freqs, vocab_size, max_piece_len, seed_size, n_em
):
    """Independent single-threaded trainer: enumeration E-step,
    the same public schedule (EM, prune+renorm, EM)."""
    counts = {}
    for w, f in word_freqs:
        for i in range(len(w)):
            for k in range(1, min(max_piece_len, len(w) - i) + 1):
                p = w[i : i + k]
                counts[p] = counts.get(p, 0) + f
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:seed_size]
    seed = dict(multi)
    seed.update({p: c for p, c in counts.items() if len(p) == 1})
    total = float(sum(seed.values()))
    model = {p: round(math.log(c / total), 9) for p, c in seed.items()}

    def em(model):
        acc = {}
        for w, f in word_freqs:
            for p, c in _brute_expected(w, model, max_piece_len).items():
                acc[p] = acc.get(p, 0.0) + c * f
        z = sum(acc[p] for p in sorted(acc))
        new = {
            p: round(math.log(c / z), 9) for p, c in acc.items() if c > 0.0
        }
        # the operator's single-char underflow floor, mirrored
        floor = round(min(new.values()) - 10.0, 9) if new else -10.0
        for p in model:
            if len(p) == 1 and p not in new:
                new[p] = floor
        return new

    for _ in range(n_em):
        model = em(model)
    chars = {p: lp for p, lp in model.items() if len(p) == 1}
    multi = sorted(
        ((p, lp) for p, lp in model.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )
    keep = dict(multi[: max(0, vocab_size - len(chars))])
    keep.update(chars)
    vals = [lp for _, lp in sorted(keep.items())]
    m = max(vals)
    lz = m + math.log(sum(math.exp(v - m) for v in vals))
    model = {p: round(lp - lz, 9) for p, lp in keep.items()}
    for _ in range(n_em):
        model = em(model)
    return sorted(model.items(), key=lambda t: (-t[1], t[0]))


_CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the cats eat the fish"),
    (2, "that hat is the cat hat"),
    (3, "fish eat the mat"),
    (4, "the the the cat"),
]


def test_unigram_train_matches_independent_reference(spark):
    df = spark.createDataFrame(_CORPUS, "doc_id int, text string")
    got = unigram_train(
        df, vocab_size=20, max_piece_len=3, seed_size=30, n_em=2
    )
    freqs = {}
    for _, t in _CORPUS:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    want = _ref_train(
        sorted(freqs.items()), 20, 3, 30, 2
    )
    assert got == want
    # proper distribution: logsumexp over the final vocab ~ 0
    vals = [lp for _, lp in got]
    m = max(vals)
    assert abs(m + math.log(sum(math.exp(v - m) for v in vals))) < 1e-6
    # the dominant word's pieces made the cut
    pieces = {p for p, _ in got}
    assert "the" in pieces


def test_unigram_train_partitioning_invariant(spark):
    rows = [(i, "crawl the web %d and dedup the web" % (i % 9)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    a = unigram_train(df, vocab_size=25, max_piece_len=4, n_em=1)
    b = unigram_train(
        df.repartition(13), vocab_size=25, max_piece_len=4, n_em=1
    )
    assert a == b


def test_unigram_train_rejects_bad_input(spark):
    df = spark.createDataFrame([(0, "  ")], "doc_id int, text string")
    with pytest.raises(ValueError):
        unigram_train(df, vocab_size=0)
    with pytest.raises(ValueError):
        unigram_train(df)  # whitespace-only corpus: nothing to seed


def test_apply_unigram_coverage_and_row_contract(spark):
    df = spark.createDataFrame(_CORPUS, "doc_id int, text string")
    vocab = unigram_train(df, vocab_size=15, max_piece_len=3, n_em=1)
    extra = spark.createDataFrame(
        [(97, ""), (98, "   "), (99, "über-OOV çhars the")],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: r
        for r in apply_unigram(df.unionByName(extra), vocab).collect()
    }
    assert set(out) == {0, 1, 2, 3, 4, 97, 98, 99}
    assert out[97].tokens == [] and out[97].n_lm_tokens == 0
    assert out[98].tokens == []
    # lossless: concatenated pieces reproduce the words, in order
    for doc_id, text in _CORPUS:
        assert "".join(out[doc_id].tokens) == "".join(text.split())
    assert "".join(out[99].tokens) == "".join("über-OOV çhars the".split())
    # repeated fluent text compresses: fewer pieces than characters
    n_chars = sum(len(w) for w in _CORPUS[4][1].split())
    assert 0 < out[4].n_lm_tokens < n_chars
    with pytest.raises(ValueError):
        apply_unigram(df, [])
