"""Distributed BPE tokenizer training (Sennrich, Haddow, Birch, ACL
2016 — the byte-pair-encoding subword algorithm used by most LLM
tokenizers), expressed Spark-first.

Scale shape: the corpus is touched ONCE — a token-frequency aggregate
(map-side combined) collapses 10^12 corpus tokens to a vocab-sized
(word, freq) table. Training then has two arms:

- "driver" (the production default once the vocab fits): collect the
  vocab-sized table and run the classic incremental trainer — pair
  counts and a pair->words inverted index maintained under a
  lazy-deletion heap, so each merge touches only the words containing
  the merged pair (total work ~ sum of affected-word lengths, not
  n_merges * |vocab|). A 32k-merge production tokenizer is 32k heap
  pops, not 32k Spark jobs. Merge order is EXACTLY the sequential
  reference's (count desc, pair ascending) — pinned by tests at 120+
  merges.
- "distributed" (vocab too large to collect): per merge, one weighted
  pair-count aggregate over the vocab table (shuffle carries distinct
  pairs, not occurrences), a 1-row argmax to the driver, and a
  JVM-side fold that re-segments the vocab. No Python executes per
  token; driver traffic is one (pair, count) row per merge.

"auto" counts the vocab (one job) and picks driver when it fits
`driver_vocab_limit` — after the first aggregate the table is
vocab-sized, which IS collectable for any real tokenizer-training
corpus (Zipf: ~10^6-10^7 distinct words at web scale after the
min_word_freq gate).

The merge fold is the paper's greedy left-to-right single-pair merge:
scanning symbols once, merging every non-overlapping occurrence
("a a a" -> ["aa", "a"]) — validated against a direct reference
implementation in tests/test_round4_fixes.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from warctools_spark.operators.text_analysis import token_frequencies


def chars(col: Column) -> Column:
    """Word -> array of single characters (JVM-side)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(col)), lambda i: col.substr(i, F.lit(1))
    )


def merge_pair(symbols: Column, x: str, y: str) -> Column:
    """One BPE merge over a symbol array: every non-overlapping
    adjacent (x, y) becomes the single symbol x+y, greedy left to
    right — a single JVM aggregate fold with (out, pending) state."""
    empty = F.array().cast("array<string>")

    def step(acc, cur):
        out, p = acc["out"], acc["p"]
        return (
            F.when(p.isNull(), F.struct(out.alias("out"), cur.alias("p")))
            .when(
                (p == x) & (cur == y),
                F.struct(
                    F.concat(out, F.array(F.lit(x + y))).alias("out"),
                    F.lit(None).cast("string").alias("p"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(out, F.array(p)).alias("out"), cur.alias("p")
                )
            )
        )

    return F.aggregate(
        symbols,
        F.struct(
            empty.alias("out"), F.lit(None).cast("string").alias("p")
        ),
        step,
        lambda acc: F.when(acc["p"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["p"]))
        ),
    )


def weighted_pair_counts(segs: DataFrame) -> DataFrame:
    """(symbols array, n) -> (x, y, count) summed over word
    frequencies; map-side combined, shuffle carries distinct pairs."""
    zipped = F.arrays_zip(
        F.slice("symbols", 1, F.size("symbols") - 1),
        F.slice("symbols", 2, F.size("symbols") - 1),
    )
    return (
        segs.where(F.size("symbols") >= 2)
        .select("n", F.explode(zipped).alias("z"))
        .groupBy(
            F.col("z.0").alias("x"), F.col("z.1").alias("y")
        )
        .agg(F.sum("n").alias("count"))
    )


def _merge_one(s: list, x: str, y: str) -> list:
    """Greedy left-to-right single-pair merge over a symbol list —
    the same fold as merge_pair, in Python."""
    out: list = []
    p = None
    for cur in s:
        if p is None:
            p = cur
        elif p == x and cur == y:
            out.append(x + y)
            p = None
        else:
            out.append(p)
            p = cur
    if p is not None:
        out.append(p)
    return out


def _train_driver(
    vocab: list, n_merges: int
) -> tuple[list, dict]:
    """Incremental BPE trainer over a collected (word, freq) vocab:
    exact sequential greedy semantics (count desc, pair ascending tie
    break — identical to the distributed argmax) with per-merge work
    proportional to the words CONTAINING the merged pair, not |vocab|.

    Data structures: pair_counts (weighted adjacency counts, always
    exact), pair_words (pair -> words possibly containing it — a LAZY
    index: membership is only ever added, never removed, and each
    candidate word is re-checked at merge time, because an adjacency
    can only be CREATED next to the just-merged symbol, so adds are
    O(occurrences of the new symbol)), and a lazy-deletion heap of
    (-count, x, y): every count change pushes a fresh entry; popped
    entries whose count no longer matches are skipped (a fresh entry
    is guaranteed to be behind them)."""
    import heapq

    freq = {w: f for w, f in vocab}
    segs = {w: list(w) for w, _ in vocab}
    pair_counts: dict = {}
    pair_words: dict = {}
    for w, f in vocab:
        s = segs[w]
        for i in range(len(s) - 1):
            p = (s[i], s[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + f
            pair_words.setdefault(p, set()).add(w)
    heap = [(-c, x, y) for (x, y), c in pair_counts.items()]
    heapq.heapify(heap)
    merges: list = []
    while len(merges) < n_merges and heap:
        negc, x, y = heapq.heappop(heap)
        cur = pair_counts.get((x, y), 0)
        if cur <= 0 or -negc != cur:
            continue  # stale: a fresh entry for the live count exists
        merges.append((x, y))
        xy = x + y
        changed: dict = {}
        for w in pair_words.get((x, y), ()):
            old = segs[w]
            new = _merge_one(old, x, y)
            if len(new) == len(old):
                continue  # lazy-index false positive: pair gone
            f = freq[w]
            segs[w] = new
            for i in range(len(old) - 1):
                p = (old[i], old[i + 1])
                changed[p] = changed.get(p, 0) - f
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                changed[p] = changed.get(p, 0) + f
            # every created adjacency involves the new symbol xy
            for i, s in enumerate(new):
                if s == xy:
                    if i > 0:
                        pair_words.setdefault(
                            (new[i - 1], xy), set()
                        ).add(w)
                    if i + 1 < len(new):
                        pair_words.setdefault(
                            (xy, new[i + 1]), set()
                        ).add(w)
        for p, d in changed.items():
            if d == 0:
                continue
            c = pair_counts.get(p, 0) + d
            if c > 0:
                pair_counts[p] = c
                heapq.heappush(heap, (-c, p[0], p[1]))
            else:
                pair_counts.pop(p, None)
        pair_counts.pop((x, y), None)
        pair_words.pop((x, y), None)
    return merges, segs


def bpe_train(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    min_word_freq: int = 1,
    mode: str = "auto",
    driver_vocab_limit: int = 2_000_000,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Train `n_merges` BPE merges on the corpus. Returns (merges in
    order, final vocab segmentation (word, symbols, n)).

    Determinism: argmax ties break on (x, y) ascending; word
    frequencies are exact integers, so the merge sequence is identical
    at any parallelism AND across the two training arms (pinned by
    tests). mode="driver" collects the vocab-sized frequency table and
    runs the incremental trainer (O(affected words) per merge — the
    path that makes n_merges=32k feasible); mode="distributed" runs
    one Spark aggregate per merge over the vocab table, each iteration
    localCheckpoint'ed so lineage depth stays O(1); "auto" picks
    driver when the vocab row count fits `driver_vocab_limit`."""
    if mode not in ("auto", "driver", "distributed"):
        raise ValueError(f"unknown mode: {mode!r}")
    vocab = token_frequencies(docs, text_col).where(
        F.col("n") >= min_word_freq
    )
    vocab_ckpt = False
    if mode == "auto":
        # the count() probe would otherwise run the full corpus
        # aggregate once, and the collect()/segs-checkpoint below a
        # SECOND time — checkpoint the (vocab-sized) result first so
        # the corpus is touched exactly once on the default path
        vocab = vocab.localCheckpoint(eager=True)
        vocab_ckpt = True
        mode = (
            "driver"
            if vocab.count() <= driver_vocab_limit
            else "distributed"
        )

    def _drop_ckpt(df):
        try:
            df._jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception:
            pass

    if mode == "driver":
        spark = docs.sparkSession
        rows = vocab.collect()
        if vocab_ckpt:
            _drop_ckpt(vocab)
        merges, segs = _train_driver(
            [(r["token"], r["n"]) for r in rows], n_merges
        )
        seg_df = spark.createDataFrame(
            [(w, segs[w], int(f)) for w, f in
             ((r["token"], r["n"]) for r in rows)],
            "word string, symbols array<string>, n bigint",
        )
        return merges, seg_df
    segs = vocab.select(
        F.col("token").alias("word"),
        chars(F.col("token")).alias("symbols"),
        "n",
    ).localCheckpoint(eager=True)
    if vocab_ckpt:
        _drop_ckpt(vocab)
    merges = []
    for _ in range(n_merges):
        top = (
            weighted_pair_counts(segs)
            .orderBy(F.desc("count"), F.asc("x"), F.asc("y"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        x, y = top[0]["x"], top[0]["y"]
        merges.append((x, y))
        prev = segs
        segs = prev.withColumn(
            "symbols", merge_pair(F.col("symbols"), x, y)
        ).localCheckpoint(eager=True)
        # free the superseded checkpoint's blocks now instead of
        # waiting for GC — otherwise a long merge loop accumulates
        # n_merges copies of the vocab table in executor storage.
        # Dataset.rdd() would be a FRESH derived RDD, not the one
        # localCheckpoint persisted; the persisted one is the
        # LogicalRDD's own rdd, reached via the analyzed plan.
        _drop_ckpt(prev)
    return merges, segs


def _segment_word_py(word: str, merges: list[tuple[str, str]]) -> list:
    """Reference-exact python segmentation (same greedy fold as
    merge_pair), used by the pandas inference arm."""
    s: list = list(word)
    for x, y in merges:
        out: list = []
        p = None
        for cur in s:
            if p is None:
                p = cur
            elif p == x and cur == y:
                out.append(x + y)
                p = None
            else:
                out.append(p)
                p = cur
        if p is not None:
            out.append(p)
        s = out
    return s


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "auto",
) -> DataFrame:
    """Segment documents with a trained merge list: whitespace words ->
    chars -> merges applied IN TRAINING ORDER (the BPE inference
    rule). Returns (id, tokens array<string>, n_bpe_tokens).

    Two physical modes, equal output (tested): "expr" chains one JVM
    fold per merge — zero Python, but the expression tree grows with
    len(merges), so it is the wrong plan for a production 32k-merge
    tokenizer; "pandas" is one Arrow-batched UDF with a per-batch
    memoized word->segmentation dict (Zipf makes the hit rate high),
    constant plan size at any merge count. "auto" picks expr below
    64 merges."""
    from warctools_spark.operators.text_analysis import tokens

    if mode == "auto":
        mode = "expr" if len(merges) < 64 else "pandas"
    if mode not in ("expr", "pandas"):
        raise ValueError(f"unknown mode: {mode!r}")
    if mode == "expr":
        word_syms = chars(F.col("__w"))
        for x, y in merges:
            word_syms = merge_pair(word_syms, x, y)
    else:
        from pyspark.sql.functions import pandas_udf

        merge_list = [tuple(m) for m in merges]

        @pandas_udf("array<string>")
        def _seg(words: pd.Series) -> pd.Series:
            cache: dict = {}

            def seg(w):
                if w not in cache:
                    cache[w] = _segment_word_py(w, merge_list)
                return cache[w]

            return words.map(seg)

        word_syms = _seg(F.col("__w"))
    exploded = docs.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("__wpos", "__w"),
    ).where(F.col("__w") != "")
    per_word = exploded.select(id_col, "__wpos", word_syms.alias("__syms"))
    agg = (
        per_word.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__wpos", "__syms"))
            ).alias("__s"),
        )
        .select(
            id_col,
            F.flatten(
                F.transform(F.col("__s"), lambda s: s["__syms"])
            ).alias("__toks"),
        )
    )
    # left-join back onto the doc ids: empty/whitespace-only documents
    # (which vanish in the explode) keep their row with an empty token
    # array instead of silently changing the corpus row count
    return (
        docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce(
                F.col("__toks"), F.array().cast("array<string>")
            ).alias("tokens"),
        )
        .withColumn("n_bpe_tokens", F.size("tokens"))
    )
