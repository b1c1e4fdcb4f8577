"""Round-5 fixes (VERDICT r04 brief + ADVICE r04):

#2 bigram_logprob joins per-doc-aggregated bigrams, not occurrences.
#5 ngram_containment jaccard denominator guarded — two docs shorter
   than n tokens yield 0.0, not null.
"""

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bigram_logprob_joins_preaggregated_table(spark):
    """The join-back input must be the (doc, w1, w2, c) pre-aggregate
    (bounded by distinct bigrams per doc), never the exploded
    occurrence table, and the corpus count tables must derive from it
    (c1 from c12 — two corpus explodes total, not three)."""
    from warctools_spark.operators.text_analysis import bigram_logprob

    docs = spark.createDataFrame(
        [(1, "of the of the of the end"), (2, "a b a b a b")],
        "doc_id long, text string",
    )
    import re

    df = bigram_logprob(docs)
    plan = _plan(df)
    # per-doc pre-aggregation exists and is what reaches the joins
    assert "Keys [3]: [doc_id" in plan
    # weighted mean over the pre-agg counts, not count(*) of join rows
    assert "partial_sum(__c" in plan
    # the streamed side of the inner join is the pre-aggregate, not a
    # Project over the exploded occurrence table
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert re.search(
        r"Join Inner[^\n]*w2[^\n]*\n[\s:+-]*Aggregate \[doc_id", logical
    ), logical
    # c1 derives from c12, so at runtime AQE reuses the c12 exchange —
    # the corpus is exploded twice, never a third time
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed


def test_bigram_logprob_weighted_mean_equals_occurrence_mean(spark):
    """Repeated bigrams: the weighted mean over (doc, bigram, c) must
    equal the plain average over occurrences (hand-computed)."""
    import math

    from warctools_spark.operators.text_analysis import bigram_logprob

    # doc 1: bigrams (a,b) x2, (b,a) x1  -> corpus counts with doc 2
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in bigram_logprob(docs).collect()}
    # corpus: n12(a,b)=3, n12(b,a)=1, n12(b,c)=1; n1(a)=3, n1(b)=2
    lp_ab = -math.log(3 / 3)
    lp_ba = -math.log(1 / 2)
    lp_bc = -math.log(1 / 2)
    assert rows[1]["n_bigrams"] == 3
    assert rows[1]["mean_neg_logprob2"] == round(
        (2 * lp_ab + lp_ba) / 3, 4
    )
    assert rows[2]["n_bigrams"] == 2
    assert rows[2]["mean_neg_logprob2"] == round((lp_ab + lp_bc) / 2, 4)


def test_ngram_containment_short_docs_zero(spark):
    """Both docs under n tokens -> empty shingle sets -> all three
    scores are 0.0 (not null): the guarded denominator contract."""
    from warctools_spark.operators.dedup import ngram_containment

    docs = spark.createDataFrame(
        [(1, "hi there"), (2, "ok"), (3, "a b c d e f")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    rows = {
        (r["id_a"], r["id_b"]): r
        for r in ngram_containment(docs, pairs, n=3).collect()
    }
    short = rows[(1, 2)]
    assert short["jaccard"] == 0.0
    assert short["containment_a_in_b"] == 0.0
    assert short["containment_b_in_a"] == 0.0
    # one short doc against a real one: still 0 overlap, still non-null
    mixed = rows[(1, 3)]
    assert mixed["jaccard"] == 0.0
