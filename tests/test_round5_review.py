"""Round-5 self-review regressions (second pass over the round diff):

1. expire_snapshots with MIXED legacy-absolute + relative manifest
   references must protect the dirs the absolute refs denote under the
   current root — the zero-match guard alone only covers the all-legacy
   case.
2. rename_over on file:// is os.replace (atomic overwrite — the old
   regression window deleted the live file before renaming).
3. A durable-stream manifest committed before the stream_id metric
   existed is tolerated on replay from the original checkpoint, not a
   permanent hard-fail.
4. ngram_jaccard short-doc pairs score 0.0 (same guarded-denominator
   contract the round gave ngram_containment).
5. drift_ratio distinguishes "no baseline recorded" (None) from a
   legitimate 0.0 baseline (-> inf when drifted).
6. _assign_to_centroids rejects unknown assign modes loudly.
7. bpe_train mode="auto" equals the explicit arms (single-corpus-pass
   checkpoint refactor changes no semantics).
"""

import json
import os

import pytest
from pyspark.sql import functions as F


# ---- 1. catalog: mixed legacy-absolute refs ----

def test_expire_protects_legacy_absolute_refs(spark, tmp_path):
    """A manifest whose seen_parts were committed as ABSOLUTE paths by
    an older version (and a root now spelled differently, so _rel
    cannot strip them) must still protect those dirs from the sweep
    when OTHER relative refs exist — the case the zero-match guard
    cannot catch."""
    from warctools_spark.plans.catalog import Catalog

    root = str(tmp_path / "cat")
    cat = Catalog(root, n_buckets=2)
    df = spark.range(3).select(
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
        F.col("id").cast("string").alias("url_sha1"),
    )
    t0 = cat.write_table(df, "seen_delta", 0)
    cat.commit(0, [t0], {"seen_parts": [t0["path"]]})
    t1 = cat.write_table(df, "seen_delta", 1)
    cat.commit(1, [t1], {"seen_parts": [t1["path"]]})

    # rewrite epoch-1's manifest the way a legacy version spelled it:
    # absolute paths under a DIFFERENT (but equivalent) root spelling
    mpath = os.path.join(root, "_manifests", "epoch_00001.json")
    m = json.load(open(mpath))
    legacy_root = str(tmp_path) + "/./cat"  # respelled absolute root
    m["tables"] = [
        {**t, "path": legacy_root + "/" + t["path"]} for t in m["tables"]
    ]
    m["metrics"]["seen_parts"] = [
        legacy_root + "/" + p for p in m["metrics"]["seen_parts"]
    ]
    json.dump(m, open(mpath, "w"))

    # keep only the newest snapshot: its refs are all legacy-absolute,
    # epoch 0's dirs are expired — but seen_delta/epoch=00001 must
    # survive because the surviving manifest references it (via the
    # respelled absolute path)
    out = cat.expire_snapshots(keep_last=1)
    assert 0 in out["expired_epochs"]
    assert "seen_delta/epoch=00001" not in out["deleted_dirs"]
    assert os.path.isdir(os.path.join(root, "seen_delta", "epoch=00001"))
    # and the kept snapshot still resolves its seen parts
    assert cat.seen_parts(1)


# ---- 2. fs: atomic overwrite on file:// ----

def test_rename_over_local_is_atomic_replace(spark, tmp_path):
    """On the local scheme rename_over must go through os.replace —
    pin by checking the destination inode CHANGES while the file is
    never absent (delete-then-rename leaves a window with no file; we
    can at least pin that overwrite works and no .tmp lingers)."""
    from warctools_spark.plans.fs import HadoopFS

    fs = HadoopFS(spark, str(tmp_path))
    p = str(tmp_path / "x.json")
    fs.write_text_atomic(p, "one")
    assert open(p).read() == "one"
    fs.write_text_atomic(p, "two")
    assert open(p).read() == "two"
    assert not os.path.exists(p + ".tmp")
    assert fs._fs.getScheme() == "file"  # the os.replace arm is live


# ---- 3. stream: legacy manifest without stream_id ----

def test_stream_replay_tolerates_legacy_manifest(spark, tmp_path):
    """A manifest committed BEFORE the stream_id metric existed (then
    replayed from the original, untouched checkpoint via the
    sink-crash window) must be accepted as a replay and re-delivered —
    not hard-fail the upgraded stream forever."""
    from warctools_spark.plans.catalog import Catalog
    from warctools_spark.streaming.frontier_stream import (
        stream_frontier_durable,
    )

    schema = "url_sha1 string, canon_url string, host string, depth int"
    src = str(tmp_path / "links")
    os.makedirs(src)
    rows = [(f"{i:040x}", f"http://h.example.com/{i}", "h.example.com", 1)
            for i in range(6)]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        src + "/b0"
    )

    cat = Catalog(str(tmp_path / "cat"), n_buckets=4)

    def crashing_sink(df, batch_id):
        raise RuntimeError("sink died after commit")

    q = stream_frontier_durable(
        spark.readStream.schema(schema).parquet(src + "/b*"),
        cat, checkpoint=str(tmp_path / "ckpt"), k_per_host=100,
        sink=crashing_sink,
    )
    with pytest.raises(Exception, match="sink died"):
        q.awaitTermination(120)
    assert cat.list_epochs() == [0]

    # rewrite the manifest the way a pre-stream_id version committed it
    mpath = os.path.join(str(tmp_path / "cat"), "_manifests",
                         "epoch_00000.json")
    m = json.load(open(mpath))
    assert m["metrics"].pop("stream_id", None) is not None
    json.dump(m, open(mpath, "w"))

    delivered = []

    def good_sink(df, batch_id):
        delivered.append(
            (batch_id, sorted(r["url_sha1"] for r in df.collect()))
        )

    q2 = stream_frontier_durable(
        spark.readStream.schema(schema).parquet(src + "/b*"),
        cat, checkpoint=str(tmp_path / "ckpt"), k_per_host=100,
        sink=good_sink,
    )
    q2.awaitTermination(120)
    assert delivered == [(0, sorted(r[0] for r in rows))]
    assert cat.list_epochs() == [0]  # replay, nothing re-committed


# ---- 4. ngram_jaccard short docs ----

def test_ngram_jaccard_short_docs_zero(spark):
    from warctools_spark.operators.dedup import ngram_jaccard

    docs = spark.createDataFrame(
        [(1, "one two"), (2, "ab"), (3, "x y z w")],
        "doc_id bigint, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a bigint, id_b bigint"
    )
    rows = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard(docs, pairs, n=3).collect()
    }
    # both docs shorter than n=3 tokens: defined 0.0, not null
    assert rows[(1, 2)] == 0.0
    # one short, one long: still 0.0 (no shared shingles)
    assert rows[(1, 3)] == 0.0


# ---- 5/6. IVF drift ratio + assign-mode validation ----

def test_drift_ratio_zero_baseline_reports_inf(spark, tmp_path):
    from warctools_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_append,
    )

    # 2 identical vectors per cell -> every vector IS its centroid,
    # baseline mean_dist == 0.0
    base = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [4.0, 4.0]), (2, [0.0, 0.0]), (3, [4.0, 4.0])],
        "vec_id bigint, embedding array<double>",
    )
    path = str(tmp_path / "ivf")
    build_ivf_index(base, path, n_cells=2, iterations=2)
    rep = ivf_index_append(
        spark.createDataFrame(
            [(10, [1.0, 1.0])], "vec_id bigint, embedding array<double>"
        ),
        path,
    )
    assert rep["baseline_mean_dist"] == 0.0
    assert rep["drift_ratio"] == float("inf")


def test_assign_to_centroids_rejects_unknown_mode(spark):
    from warctools_spark.operators.similarity import _assign_to_centroids

    df = spark.createDataFrame(
        [(1, [0.0, 0.0])], "vec_id bigint, __v array<double>"
    )
    with pytest.raises(ValueError, match="assign_mode"):
        _assign_to_centroids(df, {0: [0.0, 0.0]}, "exprs")


# ---- 7. bpe auto arm unchanged ----

def test_bpe_auto_mode_equals_explicit_arms(spark):
    from warctools_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "new newer newest new")],
        "doc_id bigint, text string",
    )
    m_auto, s_auto = bpe_train(docs, n_merges=8, mode="auto")
    m_drv, _ = bpe_train(docs, n_merges=8, mode="driver")
    assert m_auto == m_drv
    segs = {
        r["word"]: r["symbols"] for r in s_auto.collect()
    }
    assert segs  # vocab survived the checkpoint/unpersist cycle
