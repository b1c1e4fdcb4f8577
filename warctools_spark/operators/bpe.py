"""Distributed BPE tokenizer training (Sennrich, Haddow, Birch, ACL
2016 — the byte-pair-encoding subword algorithm used by most LLM
tokenizers), expressed Spark-first.

Scale shape: the corpus is touched ONCE — a token-frequency aggregate
(map-side combined) collapses 10^12 corpus tokens to a vocab-sized
(word, freq) table — and every training iteration runs over that
vocab table only: one weighted pair-count aggregate (shuffle carries
distinct pairs, not occurrences), a 1-row argmax to the driver, and a
JVM-side fold that re-segments the vocab. No Python executes per
token; driver traffic is one (pair, count) row per merge.

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


def bpe_train(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    min_word_freq: int = 1,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Train `n_merges` BPE merges on the corpus. Returns (merges in
    order, final vocab segmentation (word, symbols, n)).

    Determinism: argmax ties break on (x, y) ascending; word
    frequencies are exact integers, so the merge sequence is identical
    at any parallelism. Each iteration localCheckpoints the re-
    segmented vocab so lineage depth stays O(1), not O(n_merges)."""
    vocab = token_frequencies(docs, text_col).where(
        F.col("n") >= min_word_freq
    )
    segs = vocab.select(
        F.col("token").alias("word"),
        chars(F.col("token")).alias("symbols"),
        "n",
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
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
        # n_merges copies of the vocab table in executor storage
        try:
            prev._jdf.rdd().unpersist(False)
        except Exception:
            pass
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
    return (
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
            ).alias("tokens"),
        )
        .withColumn("n_bpe_tokens", F.size("tokens"))
    )
