"""Round-5 fixes (VERDICT r04 brief + ADVICE r04):

#5 ngram_containment jaccard denominator guarded — two docs shorter
   than n tokens yield 0.0, not null.
"""

import pytest
from pyspark.sql import functions as F


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
