"""Round-5 fixes (VERDICT r04 brief + ADVICE r04):

#2 bigram_logprob joins per-doc-aggregated bigrams, not occurrences.
#3 BPE driver-mode incremental trainer: exact sequential merge order
   at production merge counts without one Spark job per merge.
#5 ngram_containment jaccard denominator guarded — two docs shorter
   than n tokens yield 0.0, not null.
ADVICE: apply_bpe keeps empty docs; distributed-loop checkpoint blocks
   actually freed.
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


def _ref_bpe_train(word_freq, k):
    """Naive sequential reference: full recount + argmax per merge
    (count desc, pair ascending) — the semantics both arms must hit."""
    from collections import Counter

    segs = {w: list(w) for w in word_freq}
    merges = []
    for _ in range(k):
        pc = Counter()
        for w, f in word_freq.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        x, y = best
        for w in segs:
            out, p = [], None
            for cur in segs[w]:
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
            segs[w] = out
    return merges, segs


def test_bpe_driver_trainer_matches_reference_at_120_merges():
    """The incremental heap trainer must reproduce the naive
    recount-per-merge reference exactly for >= 100 merges on a corpus
    big enough to exercise stale-heap-entry and index maintenance."""
    import random

    from collections import Counter

    from warctools_spark.operators.bpe import _train_driver

    rng = random.Random(42)
    syll = ["lo", "wer", "ne", "west", "ing", "ed", "un", "re", "ab",
            "ba", "ca", "da", "xy", "zz", "qu", "th", "er", "on"]
    words = [
        "".join(rng.choice(syll) for _ in range(rng.randint(1, 4)))
        for _ in range(3000)
    ]
    wf = Counter(words)
    ref_merges, ref_segs = _ref_bpe_train(dict(wf), 120)
    merges, segs = _train_driver(sorted(wf.items()), 120)
    assert merges == ref_merges
    assert segs == ref_segs


def test_bpe_train_driver_equals_distributed(spark):
    """Both training arms produce the identical merge sequence and
    final vocab segmentation."""
    from warctools_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [(0, "low lower lowest low low"), (1, "new newer newest new"),
         (2, "renew renewed unending abba abba")],
        "doc_id long, text string",
    )
    m_drv, s_drv = bpe_train(docs, n_merges=25, mode="driver")
    m_dst, s_dst = bpe_train(docs, n_merges=25, mode="distributed")
    assert [tuple(m) for m in m_drv] == [tuple(m) for m in m_dst]
    a = {r["word"]: (r["symbols"], r["n"]) for r in s_drv.collect()}
    b = {r["word"]: (r["symbols"], r["n"]) for r in s_dst.collect()}
    assert a == b
    with pytest.raises(ValueError, match="unknown mode"):
        bpe_train(docs, n_merges=1, mode="nope")


def test_bpe_distributed_loop_frees_superseded_checkpoints(spark):
    """The distributed merge loop must not accumulate one persisted
    vocab copy per merge: superseded localCheckpoint blocks are
    unpersisted (the Dataset.rdd()-is-a-fresh-RDD trap)."""
    from warctools_spark.operators.bpe import bpe_train

    sc = spark.sparkContext
    before = sc._jsc.sc().getPersistentRDDs().size()
    docs = spark.createDataFrame(
        [(0, "low lower lowest low low"), (1, "new newer newest new")],
        "doc_id long, text string",
    )
    bpe_train(docs, n_merges=8, mode="distributed")
    after = sc._jsc.sc().getPersistentRDDs().size()
    # only the final segs checkpoint may remain, not 8 generations
    assert after - before <= 1


def test_apply_bpe_keeps_empty_documents(spark):
    """Empty / whitespace-only docs must survive tokenization with an
    empty token array (row count is corpus-invariant), in both modes."""
    from warctools_spark.operators.bpe import apply_bpe

    docs = spark.createDataFrame(
        [(0, "low low"), (1, ""), (2, "   "), (3, "new")],
        "doc_id long, text string",
    )
    for mode in ("expr", "pandas"):
        rows = {r["doc_id"]: r
                for r in apply_bpe(docs, [("l", "o")], mode=mode).collect()}
        assert set(rows) == {0, 1, 2, 3}
        assert rows[1]["tokens"] == [] and rows[1]["n_bpe_tokens"] == 0
        assert rows[2]["tokens"] == [] and rows[2]["n_bpe_tokens"] == 0
        assert rows[0]["tokens"] == ["lo", "w", "lo", "w"]


def test_catalog_file_scheme_root_full_cycle(spark, tmp_path):
    """Catalog(root='file://...') exercises the Hadoop FileSystem seam
    end-to-end (same code path as s3a://): commit, resume, expire,
    rollback all behave exactly as with a plain local path."""
    from warctools_spark.plans.catalog import Catalog

    cat = Catalog("file://" + str(tmp_path / "cat"), n_buckets=4)
    for e in range(3):
        df = spark.range(e * 10, e * 10 + 10).select(
            F.md5(F.col("id").cast("string")).alias("url_sha1")
        )
        t = cat.write_table(df, "queue", e, bucket_col=None)
        cat.commit(e, [t], {"queue_size": 10,
                            "seen_parts": [cat.table_path("queue", e)]})
    assert cat.list_epochs() == [0, 1, 2]
    assert cat.latest_epoch() == 2
    # manifests store root-relative paths; reads resolve them
    m = cat.read_manifest(2)
    assert m["tables"][0]["path"] == "queue/epoch=00002"
    assert cat.seen_parts(2) == [cat.table_path("queue", 2)]
    assert cat.read_table(spark, "queue", 2).count() == 10
    res = cat.expire_snapshots(keep_last=2)
    assert res["expired_epochs"] == [0]
    assert "queue/epoch=00000" in res["deleted_dirs"]
    assert cat.read_table(spark, "queue", 1).count() == 10  # kept
    assert cat.rollback(1) == [2]
    assert cat.latest_epoch() == 1


def test_catalog_respelled_root_resolves_same_references(spark, tmp_path):
    """Root-relative manifests: reopening the catalog under an
    equivalent-but-different spelling of the same root must resolve
    the identical reference set — expire deletes nothing it needs."""
    from warctools_spark.plans.catalog import Catalog

    plain = str(tmp_path / "cat")
    cat = Catalog(plain, n_buckets=4)
    for e in range(2):
        df = spark.range(10).select(
            F.md5(F.col("id").cast("string")).alias("url_sha1")
        )
        t = cat.write_table(df, "seen_delta", e, bucket_col=None)
        cat.commit(e, [t], {"seen_parts": [
            cat.table_path("seen_delta", i) for i in range(e + 1)
        ]})
    # reopen under file:// spelling — every epoch-1 reference (which
    # reaches BACK into epoch 0's delta) must survive expiry
    cat2 = Catalog("file://" + plain, n_buckets=4)
    res = cat2.expire_snapshots(keep_last=1)
    assert res["expired_epochs"] == [0]
    assert res["deleted_dirs"] == []  # epoch-0 delta still referenced
    assert cat2.read_table(spark, "seen_delta", 0).count() == 10


def test_catalog_expire_refuses_when_references_resolve_nowhere(
    spark, tmp_path
):
    """Belt-and-braces guard: if surviving manifests reference zero
    existing paths (legacy absolute spellings whose table/epoch tails
    do not exist under the current root either), the sweep must refuse
    rather than delete live crawl state. (A legacy absolute ref whose
    TAIL does exist locally is instead protected in place —
    test_round5_review.py::test_expire_protects_legacy_absolute_refs.)"""
    import json

    from warctools_spark.plans.catalog import Catalog

    root = tmp_path / "cat"
    cat = Catalog(str(root), n_buckets=4)
    df = spark.range(10).select(
        F.md5(F.col("id").cast("string")).alias("url_sha1")
    )
    cat.write_table(df, "queue", 0, bucket_col=None)
    # legacy-style manifest: absolute paths under a DIFFERENT root,
    # with an epoch dir that has no local counterpart
    (root / "_manifests").mkdir(parents=True, exist_ok=True)
    manifest = {
        "epoch": 0, "n_buckets": 4,
        "tables": [{"table": "queue",
                    "path": "/nonexistent/oldroot/queue/epoch=00099"}],
        "metrics": {},
    }
    (root / "_manifests" / "epoch_00000.json").write_text(
        json.dumps(manifest)
    )
    with pytest.raises(RuntimeError, match="refusing to sweep"):
        cat.expire_snapshots(keep_last=1)
    # nothing was deleted
    assert cat.read_table(spark, "queue", 0).count() == 10


def test_ivf_index_file_scheme_equals_plain(spark, tmp_path):
    """build_ivf_index / ivf_index_topk through a file:// path (the
    Hadoop FS seam) return exactly the plain-path results."""
    from warctools_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_topk,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(200)
    q = [0.1] * len(emb.first()["embedding"])
    p1 = str(tmp_path / "idx_plain")
    p2 = "file://" + str(tmp_path / "idx_scheme")
    c1 = build_ivf_index(emb, p1, n_cells=4, iterations=2)
    c2 = build_ivf_index(emb, p2, n_cells=4, iterations=2)
    assert c1 == c2
    r1 = [(r["vec_id"], r["cosine"])
          for r in ivf_index_topk(spark, p1, q, k=5, n_probe=2).collect()]
    r2 = [(r["vec_id"], r["cosine"])
          for r in ivf_index_topk(spark, p2, q, k=5, n_probe=2).collect()]
    assert r1 == r2


def test_rfc9309_specificity_counts_octets_not_chars(spark):
    """RFC 9309 most-specific-rule precedence is by OCTET count of the
    pattern. Chosen so character count TIES (where Allow would win)
    but octet count does not: allow '/caf*z' (6 octets) vs disallow
    '/caf\u00e9\u00e9' (8 octets, 6 chars) on path '/caf\u00e9\u00e9z'
    — must be BLOCKED under octets, allowed under the old char count."""
    from warctools_spark.operators.robots import apply_robots

    frontier = spark.createDataFrame(
        [("h.example.com", "http://h.example.com/caf\u00e9\u00e9z")],
        "host string, canon_url string",
    )
    robots = spark.createDataFrame(
        [("h.example.com", ["/caf*z"], ["/caf\u00e9\u00e9"], 0)],
        "host string, allow array<string>, disallow array<string>, "
        "crawl_delay_ms long",
    )
    out = apply_robots(frontier, robots, match_mode="rfc9309").collect()
    assert out == []  # longer-in-octets disallow wins

    # ascii control: unchanged semantics
    robots2 = spark.createDataFrame(
        [("h.example.com", ["/cafez", "/caf*z"], ["/caf"], 0)],
        "host string, allow array<string>, disallow array<string>, "
        "crawl_delay_ms long",
    )
    frontier2 = spark.createDataFrame(
        [("h.example.com", "http://h.example.com/cafez")],
        "host string, canon_url string",
    )
    out2 = apply_robots(frontier2, robots2, match_mode="rfc9309").collect()
    assert len(out2) == 1


def test_ivf_index_append_query_equality_and_pruning(spark, tmp_path):
    """Round-5 brief #8: append new vectors to a persisted IVF index
    without retraining. Queries over the appended index must equal the
    ground truth computed by assigning the UNION to the ORIGINAL
    centroids (the no-retrain contract), and the probed scan must
    still prune partitions."""
    from warctools_spark.operators.similarity import (
        _assign_to_centroids,
        brute_force_topk,
        build_ivf_index,
        ivf_index_append,
        ivf_index_topk,
        _select_probe_cells,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.where(F.col("vec_id") < 300)
    extra = emb.where(
        (F.col("vec_id") >= 300) & (F.col("vec_id") < 450)
    )
    path = str(tmp_path / "idx")
    centroids = build_ivf_index(base, path, n_cells=4, iterations=2)
    rep = ivf_index_append(extra, path)
    assert rep["n_appended"] == extra.count()
    assert rep["baseline_mean_dist"] > 0
    assert rep["drift_ratio"] == pytest.approx(
        rep["mean_dist"] / rep["baseline_mean_dist"]
    )

    dims = len(next(iter(centroids.values())))
    q = [0.05 * ((i % 5) - 2) for i in range(dims)]
    got = [
        (r["vec_id"], r["cosine"])
        for r in ivf_index_topk(spark, path, q, k=8, n_probe=2).collect()
    ]
    # ground truth: union assigned to the ORIGINAL centroids, probe
    # the same cells, exact rerank
    union = base.unionByName(extra).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("__v")
    )
    assigned = _assign_to_centroids(union, centroids, "expr")
    probe = _select_probe_cells(centroids, q, 2)
    cands = assigned.where(F.col("cluster").isin(probe)).select(
        "vec_id", F.col("__v").alias("embedding")
    )
    want = [
        (r["vec_id"], r["cosine"])
        for r in brute_force_topk(cands, q, k=8).collect()
    ]
    assert got == want

    # the appended index still partition-prunes the probed cells
    sel = spark.read.parquet(path + "/vectors").where(
        F.col("cluster").isin(probe)
    )
    plan = _plan(sel)
    import re as _re

    assert _re.search(r"PartitionFilters: \[cluster#\d+ IN \(", plan), plan
