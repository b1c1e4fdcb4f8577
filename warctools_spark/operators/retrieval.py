"""Ranked retrieval: BM25 scoring over the document corpus.

The RAG-corpus side of the engine (rag_corpus, chunk_documents,
inverted_index) needs a ranking function to go from "index" to
"search". BM25 (Robertson & Spärck Jones probabilistic relevance
framework; the k1/b form popularized by Okapi, with the
non-negative idf variant ln(1 + (N - df + .5)/(df + .5)) used by
Lucene) is the standard lexical baseline. No reference counterpart —
warctools has no retrieval; cited from the public literature only.

Scale: the ONLY corpus-sized work is one token explode filtered to
the query's terms BEFORE any aggregation (an isin over a literal
list — pushed into the scan, so a 5-term query over 10^9 docs
aggregates only rows containing those 5 terms). Document lengths
come from a map-side expression on the same scan. The df/N/avgdl
statistics are a ≤|query|-row and two 1-row tables — all broadcast.
Top-k is ORDER BY + LIMIT = TakeOrderedAndProject (per-partition
heaps, k rows to the driver, never a global sort).

Tokenization matches token_counts/unigram_logprob: lowercase,
whitespace split — so BM25 scores line up with the rest of the text
family and the DuckDB replay is engine-neutral.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warctools_spark.operators.text_analysis import tokens


def bm25_topk(
    docs: DataFrame,
    query: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25:

        score(D, Q) = sum_{t in Q} idf(t) * tf(t,D) * (k1 + 1)
                      / (tf(t,D) + k1 * (1 - b + b * |D|/avgdl))
        idf(t) = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))

    Duplicate query terms count once (bag semantics are the corpus
    side's job). Scores round to 4 decimals with id as the total
    tie-break, so the top-k set is stable across partitionings and
    engines (ORACLES.md #5/#9).

    Output: (id, score, n_hits) ordered by (score desc, id), where
    n_hits is how many distinct query terms the document contains.
    Documents matching no query term never appear.
    """
    if not query:
        raise ValueError("query must contain at least one term")
    terms = sorted({t.lower() for t in query})
    toks = docs.select(
        F.col(id_col),
        F.size(tokens(F.lower(F.col(text_col)))).alias("dl"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    ).where(F.col("term").isin(terms))
    tf = toks.groupBy(id_col, "term").agg(
        F.count("*").cast("double").alias("tf"), F.first("dl").alias("dl")
    )
    stats = docs.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.size(tokens(F.lower(F.col(text_col))))).alias("avgdl"),
    )
    df_t = tf.groupBy("term").agg(
        F.countDistinct(id_col).cast("double").alias("df")
    )
    idf = df_t.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
        "avgdl",
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .select(
            F.col(id_col),
            (
                F.col("idf")
                * F.col("tf")
                * (k1 + 1.0)
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
        .groupBy(id_col)
        .agg(
            F.round(F.sum("s"), 4).alias("score"),
            F.count("*").alias("n_hits"),
        )
    )
    return scored.orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    ).limit(k)
