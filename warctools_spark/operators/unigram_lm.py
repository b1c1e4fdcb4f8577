"""Distributed unigram-LM subword tokenizer training (Kudo, ACL 2018,
"Subword Regularization" §3 — the SentencePiece unigram model), the
probabilistic sibling of bpe.py: pieces carry log-probabilities, a
word's segmentation is the Viterbi-best path over its piece lattice,
and training is EM — the E-step computes each piece's EXPECTED count
over all segmentations of every word (forward-backward on the word
lattice), the M-step renormalizes.

Deviations from the full Kudo recipe, chosen for engine-exact
determinism and spelled out so the contract is honest:
  * fixed two-phase schedule (EM x n_em, one prune to vocab_size,
    EM x n_em) instead of loss-driven repeated pruning;
  * the seed is the top `seed_size` substrings by weighted count
    (ties piece-ascending) instead of a suffix-array ESA seed;
  * pruning keeps the top pieces by probability (ties
    piece-ascending) instead of by likelihood-loss, and ALWAYS keeps
    every single character seen in the corpus, so any training word
    stays segmentable (Kudo's "character coverage 1.0").

Scale shape (the bpe.py discipline): the corpus is touched ONCE —
token_frequencies collapses 10^12 corpus tokens to a vocab-sized
(word, freq) table, which is localCheckpoint'ed; every EM iteration
is ONE Arrow-batched pass over that table (each pandas batch emits
per-piece partial expected counts, one row per piece per batch — the
shuffle carries |pieces| x n_batches rows, never per-word rows) plus
one map-side-combined sum. The piece table (<= seed_size entries,
a few MB at the 10^4..10^5 piece counts real tokenizers use) rides
into executors inside the UDF closure, and the M-step renormalize is
a vocab-sized driver reduce — the same collectability argument as
bpe_train's driver arm.

Determinism: word frequencies are exact integers; per-word lattice
arithmetic is fixed-order (left-to-right alpha, right-to-left beta)
so every engine computes identical doubles per word; cross-partition
SUM order only perturbs expected counts at ~1e-14 relative, and the
M-step rounds log-probs to 9 decimals — five orders above the noise,
same argument as graph.pagerank's round_iter (ORACLES.md #5). Pinned
by tests: partitioning invariance, and exact agreement of the E-step
with a brute-force enumeration of ALL segmentations.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warctools_spark.operators.text_analysis import token_frequencies


def _piece_logsumexp(xs: list) -> float:
    m = max(xs)
    if m == float("-inf"):
        return m
    return m + math.log(sum(math.exp(x - m) for x in xs))


def _estep_word(word: str, logp: dict, max_len: int) -> dict:
    """Expected piece counts for ONE word under the current model:
    forward-backward over the segmentation lattice. Returns
    {piece: expected count per occurrence of the word}; {} if the
    word has no path (cannot happen while training keeps all single
    chars). Fixed-order arithmetic: alpha left-to-right, beta
    right-to-left, arcs enumerated by (start asc, end asc)."""
    n = len(word)
    neg = float("-inf")
    alpha = [neg] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        terms = []
        for j in range(max(0, i - max_len), i):
            lp = logp.get(word[j:i])
            if lp is not None and alpha[j] != neg:
                terms.append(alpha[j] + lp)
        if terms:
            alpha[i] = _piece_logsumexp(terms)
    if alpha[n] == neg:
        return {}
    beta = [neg] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        terms = []
        for k in range(i + 1, min(n, i + max_len) + 1):
            lp = logp.get(word[i:k])
            if lp is not None and beta[k] != neg:
                terms.append(lp + beta[k])
        if terms:
            beta[i] = _piece_logsumexp(terms)
    out: dict = {}
    z = alpha[n]
    for j in range(n):
        if alpha[j] == neg:
            continue
        for i in range(j + 1, min(n, j + max_len) + 1):
            lp = logp.get(word[j:i])
            if lp is not None and beta[i] != neg:
                p = math.exp(alpha[j] + lp + beta[i] - z)
                piece = word[j:i]
                out[piece] = out.get(piece, 0.0) + p
    return out


def _viterbi_word(
    word: str, logp: dict, max_len: int, oov_logp: float
) -> list:
    """Viterbi-best segmentation. Unknown single characters are
    allowed as OOV arcs at `oov_logp` so coverage is total. Ties
    break toward the SMALLEST split point (longest last piece),
    applied recursively — deterministic in any engine."""
    n = len(word)
    if n == 0:
        return []
    neg = float("-inf")
    best = [neg] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        b, bj = neg, -1
        for j in range(max(0, i - max_len), i):
            if best[j] == neg:
                continue
            lp = logp.get(word[j:i])
            if lp is None and i - j == 1:
                lp = oov_logp
            if lp is None:
                continue
            s = best[j] + lp
            if s > b or (s == b and j < bj):
                b, bj = s, j
        best[i], back[i] = b, bj
    out = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def unigram_seed(
    vocab: DataFrame, max_piece_len: int = 6, seed_size: int = 4000
) -> DataFrame:
    """Candidate pieces from a (token, n) word-frequency table: every
    substring of length <= max_piece_len of every distinct word,
    weighted by word frequency and occurrence multiplicity: the top
    `seed_size` MULTI-character substrings by (count desc, piece asc)
    PLUS every single character regardless of rank (coverage floor).
    Returns (piece, c: bigint).

    One explode over the vocab-sized word table: a length-L word
    emits <= L*max_piece_len rows, so the pass is O(|vocab| * L * K),
    never corpus-sized. The top-k is TakeOrderedAndProject."""
    w = F.col("token")
    pieces = vocab.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length(w)),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(max_piece_len), F.length(w) - i + 1
                            ),
                        ),
                        lambda l: w.substr(i, l),
                    ),
                )
            )
        ).alias("piece"),
        F.col("n"),
    )
    counts = pieces.groupBy("piece").agg(F.sum("n").alias("c"))
    top = counts.where(F.length("piece") > 1).orderBy(
        F.col("c").desc(), F.col("piece")
    ).limit(seed_size)
    chars = counts.where(F.length("piece") == 1)
    return top.unionByName(chars).distinct()


def unigram_train(
    docs: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    max_piece_len: int = 6,
    seed_size: int | None = None,
    n_em: int = 2,
    min_word_freq: int = 1,
) -> list[tuple[str, float]]:
    """Train a unigram-LM tokenizer on the corpus. Returns the final
    piece table as [(piece, logp)] sorted by (logp desc, piece asc),
    log-probs rounded to 9 decimals. Feed it to `apply_unigram`.

    Schedule: seed -> EM x n_em -> prune to vocab_size (all single
    chars always kept) -> EM x n_em -> final renormalize. Every
    E-step is one Arrow pass over the checkpointed (word, freq)
    table; every M-step is a vocab-sized driver renormalize."""
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    if seed_size is None:
        seed_size = 4 * vocab_size
    words = (
        token_frequencies(docs, text_col)
        .where(F.col("n") >= min_word_freq)
        .localCheckpoint(eager=True)
    )
    seed = unigram_seed(words, max_piece_len, seed_size).collect()
    if not seed:
        raise ValueError("empty corpus: no candidate pieces")
    total = float(sum(r["c"] for r in seed))
    model = {
        r["piece"]: round(math.log(r["c"] / total), 9) for r in seed
    }

    def em_round(model: dict) -> dict:
        snapshot = dict(model)
        klen = max_piece_len

        def part(batches):
            for pdf in batches:
                acc: dict = {}
                order = sorted(
                    zip(pdf["token"], pdf["n"]), key=lambda t: t[0]
                )
                for wd, f in order:
                    for piece, c in _estep_word(wd, snapshot, klen).items():
                        acc[piece] = acc.get(piece, 0.0) + c * int(f)
                yield pd.DataFrame(
                    {"piece": list(acc), "c": list(acc.values())}
                )

        sums = sorted(
            words.mapInPandas(part, "piece string, c double")
            .groupBy("piece")
            .agg(F.sum("c").alias("c"))
            .collect(),
            key=lambda r: r["piece"],
        )  # fixed fold order for the driver-side total
        z = float(sum(r["c"] for r in sums))
        new = {
            r["piece"]: round(math.log(r["c"] / z), 9)
            for r in sums
            if r["c"] > 0.0
        }
        # coverage floor: a single char whose every posterior
        # underflowed exp() to exactly 0.0 (pathological 100+-char
        # tokens) must not vanish mid-training, or words containing
        # it become unsegmentable for every later E-step; re-add at
        # a deterministic floor below the smallest surviving piece
        floor = round(min(new.values()) - 10.0, 9) if new else -10.0
        for p in snapshot:
            if len(p) == 1 and p not in new:
                new[p] = floor
        return new

    for _ in range(n_em):
        model = em_round(model)
    # prune: keep every single char, top up with multi-char pieces
    chars = {p: lp for p, lp in model.items() if len(p) == 1}
    multi = sorted(
        ((p, lp) for p, lp in model.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )
    keep = dict(multi[: max(0, vocab_size - len(chars))])
    keep.update(chars)
    # renormalize over the survivors (fixed piece-ascending fold) so
    # the next E-step sees a proper distribution — an unnormalized
    # model would bias path weights by segmentation LENGTH
    lz = _piece_logsumexp([lp for _, lp in sorted(keep.items())])
    model = {p: round(lp - lz, 9) for p, lp in keep.items()}
    for _ in range(n_em):
        model = em_round(model)
    return sorted(model.items(), key=lambda t: (-t[1], t[0]))


def apply_unigram(
    docs: DataFrame,
    vocab: list[tuple[str, float]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment documents with a trained unigram-LM piece table:
    whitespace words -> Viterbi-best piece sequence. Returns
    (id, tokens array<string>, n_lm_tokens), one row per input row —
    empty/whitespace-only docs keep an empty array (the apply_bpe
    contract). Characters outside the vocab become single-char OOV
    pieces at (min vocab logp - 10), so output always covers input.

    One Arrow-batched UDF over exploded words with a per-batch
    word -> segmentation memo (Zipf makes the hit rate high), then
    the order-preserving regroup; constant plan size at any vocab."""
    from pyspark.sql.functions import pandas_udf

    from warctools_spark.operators.text_analysis import tokens

    if not vocab:
        raise ValueError("empty vocab")
    logp = {p: lp for p, lp in vocab}
    max_len = max(len(p) for p in logp)
    oov_logp = min(logp.values()) - 10.0

    @pandas_udf("array<string>")
    def _seg(words: pd.Series) -> pd.Series:
        cache: dict = {}

        def seg(w):
            if w not in cache:
                cache[w] = _viterbi_word(w, logp, max_len, oov_logp)
            return cache[w]

        return words.map(seg)

    exploded = docs.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("__wpos", "__w"),
    ).where(F.col("__w") != "")
    per_word = exploded.select(
        id_col, "__wpos", _seg(F.col("__w")).alias("__syms")
    )
    agg = (
        per_word.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__wpos", "__syms"))
            ).alias("__s")
        )
        .select(
            id_col,
            F.flatten(
                F.transform(F.col("__s"), lambda s: s["__syms"])
            ).alias("__toks"),
        )
    )
    return (
        docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce(
                F.col("__toks"), F.array().cast("array<string>")
            ).alias("tokens"),
        )
        .withColumn("n_lm_tokens", F.size("tokens"))
    )
