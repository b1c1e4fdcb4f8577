"""Round-5 widening operators: DSIR importance resampling, CCNet
perplexity bucketing, count-min / HyperLogLog sketches, n-gram
novelty. Each oracle-checked via __spark_entry__; these tests pin the
semantic properties and the plan shapes the oracles can't see."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from warctools_spark.operators.sampling import dsir_select, dsir_weights
from warctools_spark.operators.sketches import cms_top_tokens, hll_distinct
from warctools_spark.operators.text_analysis import ccnet_buckets, ngram_novelty


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(SF_DIR + "/documents.parquet").cache()


# ---------------------------------------------------------------- DSIR


def test_dsir_preserves_row_count_and_empty_docs(spark):
    df = spark.createDataFrame(
        [
            (0, "alpha beta gamma", "en"),
            (1, "", "en"),
            (2, "   ", "fr"),
            (3, "alpha beta", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    out = dsir_weights(df, df.where("lang = 'en'")).orderBy("doc_id").collect()
    assert [r.doc_id for r in out] == [0, 1, 2, 3]
    assert out[1].n_grams == 0 and out[1].log_weight == 0.0
    assert out[2].n_grams == 0 and out[2].log_weight == 0.0
    # unigrams + bigrams: 3 tokens -> 3 + 2 grams
    assert out[0].n_grams == 5
    assert out[3].n_grams == 3


def test_dsir_upweights_target_like_docs(spark):
    # target speaks only "good"; raw corpus also contains "junk" docs.
    rows = [(i, "good text about crawling the web", "t") for i in range(20)]
    rows += [(100 + i, "junk spam casino pills discount", "r") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    w = dsir_weights(df, df.where("lang = 't'")).collect()
    by_id = {r.doc_id: r.log_weight for r in w}
    assert all(by_id[i] > by_id[100 + j] for i in range(20) for j in range(20))


def test_dsir_weights_partitioning_invariant(docs):
    target = docs.where("lang = 'en'")
    a = {
        r.doc_id: (r.n_grams, r.log_weight)
        for r in dsir_weights(docs, target).collect()
    }
    b = {
        r.doc_id: (r.n_grams, r.log_weight)
        for r in dsir_weights(docs.repartition(17), target.coalesce(1)).collect()
    }
    assert a == b


def test_dsir_select_is_deterministic_topk(docs):
    target = docs.where("lang = 'en'")
    s1 = dsir_select(docs, target, k=25).collect()
    s2 = dsir_select(docs.repartition(13), target, k=25).collect()
    assert len(s1) == 25
    assert {r.doc_id for r in s1} == {r.doc_id for r in s2}
    # selection is biased toward high-weight docs vs a uniform draw
    scores = sorted(r.dsir_score for r in s1)
    assert scores[0] > float("-inf")


def test_dsir_plan_broadcasts_ratio_table_no_python(docs):
    plan = _plan(dsir_weights(docs, docs.where("lang = 'en'")))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # lam table join, never SMJ


# --------------------------------------------------------------- CCNet


def test_ccnet_buckets_exact_thirds(docs):
    out = ccnet_buckets(docs).groupBy("ppl_bucket").count().collect()
    sizes = {r.ppl_bucket: r["count"] for r in out}
    n = sum(sizes.values())
    # thirds up to score-tie granularity
    assert set(sizes) == {"head", "middle", "tail"}
    for v in sizes.values():
        assert abs(v - n / 3) <= max(5, 0.05 * n)


def test_ccnet_bucket_order_is_by_score(docs):
    rows = ccnet_buckets(docs).collect()
    hi_head = max(r.mean_neg_logprob for r in rows if r.ppl_bucket == "head")
    lo_mid = min(r.mean_neg_logprob for r in rows if r.ppl_bucket == "middle")
    hi_mid = max(r.mean_neg_logprob for r in rows if r.ppl_bucket == "middle")
    lo_tail = min(r.mean_neg_logprob for r in rows if r.ppl_bucket == "tail")
    assert hi_head <= lo_mid <= hi_mid <= lo_tail


# ------------------------------------------------------------- sketches


def test_cms_estimate_is_one_sided(docs):
    rows = cms_top_tokens(docs, k=50).collect()
    assert rows and all(r.n_cms >= r.n_exact for r in rows)


def test_cms_finds_the_true_heavy_hitter(spark):
    rows = [(i, "hot " * 50 + f"cold{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = cms_top_tokens(df, k=1).collect()
    assert top[0].token == "hot" and top[0].n_exact == 5000


def test_hll_within_error_bound(spark):
    df = spark.range(20000).select(
        F.concat(F.lit("url-"), F.col("id")).alias("u")
    )
    row = hll_distinct(df, "u").collect()[0]
    assert row.n_exact == 20000
    # 256 registers -> 6.5% std err; allow 4 sigma
    assert row.rel_err < 4 * 1.04 / (256 ** 0.5)


def test_hll_rejects_non_power_of_two():
    with pytest.raises(ValueError):
        hll_distinct(None, "x", m=100)


def test_hll_is_insensitive_to_duplication(spark):
    base = spark.range(5000).select(
        F.concat(F.lit("h-"), F.col("id")).alias("u")
    )
    dup = base.union(base).union(base)
    a = hll_distinct(base, "u").collect()[0]
    b = hll_distinct(dup, "u").collect()[0]
    assert a.n_hll == b.n_hll  # registers depend on the SET only


def test_sketch_plans_stay_jvm_side(docs):
    for df in (cms_top_tokens(docs), ):
        plan = _plan(df)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# -------------------------------------------------------------- novelty


def test_novelty_duplicate_doc_scores_zero(spark):
    text = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(0, text), (1, text), (2, "completely different words here entirely now yes")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in ngram_novelty(df).collect()}
    assert out[0].novelty == 1.0  # first occurrence owns every shingle
    assert out[1].novelty == 0.0  # verbatim duplicate
    assert out[2].novelty == 1.0
    assert out[0].n_shingles == out[1].n_shingles


def test_novelty_bounds_and_row_count(docs):
    rows = ngram_novelty(docs).collect()
    assert len(rows) == docs.count()
    assert all(0.0 <= r.novelty <= 1.0 for r in rows)
    assert all(r.n_novel <= r.n_shingles for r in rows)


# ------------------------------------------------- sketch mergeability


def test_cms_merge_equals_whole_corpus_grid(spark, docs):
    from warctools_spark.operators.sketches import (
        cms_counters,
        cms_lookup,
        cms_merge,
    )

    a = docs.where("doc_id % 2 = 0")
    b = docs.where("doc_id % 2 = 1")
    merged = cms_merge(cms_counters(a), cms_counters(b))
    whole = cms_counters(docs)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0
    # point queries through the merged grid match the whole-corpus grid
    probes = spark.createDataFrame([("the",), ("absent-token",)], "token string")
    got = {r.token: r.n_cms for r in cms_lookup(merged, probes).collect()}
    want = {r.token: r.n_cms for r in cms_lookup(whole, probes).collect()}
    assert got == want
    assert got["absent-token"] >= 0  # missing buckets read as 0


def test_hll_merge_equals_union_registers(spark):
    from warctools_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    a = spark.range(0, 6000).select(F.concat(F.lit("u-"), "id").alias("u"))
    b = spark.range(4000, 9000).select(F.concat(F.lit("u-"), "id").alias("u"))
    merged = hll_merge(hll_registers(a, "u"), hll_registers(b, "u"))
    union = hll_registers(a.union(b), "u")
    assert merged.exceptAll(union).count() == 0
    assert union.exceptAll(merged).count() == 0
    est = hll_estimate(merged).collect()[0].n_hll
    assert abs(est - 9000) / 9000 < 4 * 1.04 / (256 ** 0.5)


def test_host_quality_rollup_shapes(spark):
    from warctools_spark.operators.text_analysis import host_quality_rollup

    df = spark.createDataFrame(
        [
            (0, "the quick brown fox", "en", "a.com"),
            (1, "the lazy dog sleeps", "en", "a.com"),
            (2, "le chat noir dort", "fr", "a.com"),
            (3, "mirror mirror mirror", "en", "b.com"),
        ],
        "doc_id long, text string, lang string, host string",
    )
    out = {r.host: r for r in host_quality_rollup(df).collect()}
    assert out["a.com"].n_docs == 3 and out["a.com"].n_langs == 2
    assert out["b.com"].n_docs == 1 and out["b.com"].n_langs == 1
    assert out["b.com"].lang_entropy == 0.0  # single-language host
    import math

    want = round(math.log(3) - (2 * math.log(2)) / 3, 4)
    assert abs(out["a.com"].lang_entropy - want) < 1e-9
