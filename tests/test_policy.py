"""Composed crawl-policy table and the distributed exact-rank helper.
The composition is verified by EQUALITY against the individually-run
component operators (each of which has its own hash-exact DuckDB
replay elsewhere), so no replay is duplicated here — what this file
pins is that the join/derivation layer adds nothing and loses
nothing."""

import pytest
from pyspark.sql import functions as F

from warctools_spark.plans.policy import (
    global_rank,
    host_reputation,
    host_url_shape,
)


def test_global_rank_matches_ground_truth(spark):
    rows = [(i, (i * 37) % 11) for i in range(500)]
    df = spark.createDataFrame(rows, "id int, v int").repartition(16)
    ranked = global_rank(
        df, F.col("v").desc(), F.col("id").asc(), out_col="r", n_shards=8
    )
    got = {(r.id, r.v): r.r for r in ranked.collect()}
    want = {
        (i, v): k + 1
        for k, (i, v) in enumerate(
            sorted(rows, key=lambda t: (-t[1], t[0]))
        )
    }
    assert got == want
    # really distributed: more than one range shard carried rows
    n_parts = (
        df.repartitionByRange(8, F.col("v").desc(), F.col("id").asc())
        .rdd.getNumPartitions()
    )
    assert n_parts > 1


def test_host_url_shape_trap_ratio(spark):
    urls = spark.createDataFrame(
        [("http://trap.com/cal/%d" % i,) for i in range(40)]
        + [("http://trap.com/about",)]
        + [("http://ok.com/a",), ("http://ok.com/b/2",), ("http://ok.com/c",)],
        "url string",
    )
    got = {r.host: r for r in host_url_shape(urls).collect()}
    t = got["trap.com"]
    assert t.n_urls == 41 and t.n_templates == 2
    assert t.trap_ratio == round(40 / 41, 6)
    assert got["ok.com"].trap_ratio < 0.7


def _inputs(spark):
    edges = spark.createDataFrame(
        [("a.com", "b.com", 3.0), ("b.com", "a.com", 1.0), ("a.com", "c.com", 1.0)],
        "src_host string, dst_host string, n_links double",
    )
    urls = spark.createDataFrame(
        [("http://a.com/x/%d" % i,) for i in range(5)]
        + [("http://d.com/only-urls",)],
        "url string",
    )
    docs = spark.createDataFrame(
        [
            ("a.com", "good text with common the words here", "en"),
            ("a.com", "more reasonable english text content", "en"),
            ("b.com", "le texte en francais ici", "fr"),
        ],
        "host string, text string, lang string",
    )
    return edges, urls, docs


def test_host_reputation_equals_components(spark):
    from warctools_spark.operators.graph import pagerank, trustrank
    from warctools_spark.operators.text_analysis import host_quality_rollup

    edges, urls, docs = _inputs(spark)
    rep = {
        r.host: r
        for r in host_reputation(
            edges, urls, docs, seeds=["a.com"], rank=False
        ).collect()
    }
    pr = {
        r.node: r.pagerank
        for r in pagerank(edges, weight_col="n_links").collect()
    }
    tr = {
        r.node: r.trustrank
        for r in trustrank(edges, ["a.com"], weight_col="n_links").collect()
    }
    shape = {r.host: r for r in host_url_shape(urls).collect()}
    qual = {r.host: r for r in host_quality_rollup(docs).collect()}

    assert set(rep) == set(pr) | set(shape) | set(qual)
    for h, row in rep.items():
        assert row.pagerank == pr.get(h)
        assert row.trustrank == tr.get(h)
        if h in pr:
            assert row.spam_gap == round(pr[h] - tr[h], 6)
        if h in shape:
            assert (row.n_urls, row.trap_ratio) == (
                shape[h].n_urls,
                shape[h].trap_ratio,
            )
        else:
            assert row.n_urls is None
        if h in qual:
            assert row.mean_quality == qual[h].mean_quality
        else:
            assert row.mean_quality is None
    # url-only host keeps its row with null graph/quality signals
    assert rep["d.com"].pagerank is None and rep["d.com"].n_urls == 1


def test_host_reputation_rank_is_total_and_consistent(spark):
    edges, urls, docs = _inputs(spark)
    rows = host_reputation(edges, urls, docs, seeds=["a.com"]).collect()
    ranks = sorted(r.policy_rank for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    key = lambda r: (
        -(r.trustrank if r.trustrank is not None else -1.0),
        -(r.mean_quality if r.mean_quality is not None else -1.0),
        r.trap_ratio if r.trap_ratio is not None else 2.0,
        r.host,
    )
    by_rank = [r.host for r in sorted(rows, key=lambda r: r.policy_rank)]
    by_key = [r.host for r in sorted(rows, key=key)]
    assert by_rank == by_key


def test_host_reputation_unseeded_nulls(spark):
    edges, urls, docs = _inputs(spark)
    rows = host_reputation(edges, urls, docs, rank=False).collect()
    assert all(r.trustrank is None and r.spam_gap is None for r in rows)
