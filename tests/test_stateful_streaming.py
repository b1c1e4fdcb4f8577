"""applyInPandasWithState cross-batch politeness budget."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from warctools_spark.sources.pages import synthesize_pages
from warctools_spark.streaming import frontier_stream as FS
from warctools_spark.streaming.stateful import rate_limit_per_host


def test_cross_batch_budget(spark, tmp_path):
    # pages written as several files; maxFilesPerTrigger=1 forces
    # multiple micro-batches so the budget must survive batch edges
    d = str(tmp_path / "pages")
    synthesize_pages(spark, SF_DIR).limit(200).repartition(4).write.parquet(d)

    stream = FS.stream_pages(spark, d, max_files_per_trigger=1)
    links = FS.harvest_with_event_time(stream).select(
        "host", "canon_url", "url_sha1", "warc_ts"
    )
    limited = rate_limit_per_host(links, budget_per_host=7)
    q = (
        limited.writeStream.format("memory")
        .queryName("rate_limit_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(300)
    # more than one micro-batch actually ran
    assert len(q.recentProgress) > 1

    rows = spark.sql("SELECT * FROM rate_limit_test").collect()
    assert rows
    per_host = {}
    for r in rows:
        per_host.setdefault(r["host"], []).append(r["host_seq"])
    for host, seqs in per_host.items():
        assert len(seqs) <= 7, host  # cumulative cap across ALL batches
        assert sorted(seqs) == list(range(1, len(seqs) + 1))  # dense seq
    # at least one host had candidates in multiple batches yet stayed
    # within budget (hot host certainly did)
    assert "hot.example.com" in per_host
    assert len(per_host["hot.example.com"]) == 7


def test_budgeted_schedule_two_batches(spark, tmp_path):
    """Batch 2's budget must reflect batch 1's fetches: a host with
    candidates in both batches gets k in batch 1 but only the
    remaining total_budget - k in batch 2."""
    from warctools_spark.streaming.stateful import budgeted_schedule_stream

    d = str(tmp_path / "pages2")
    synthesize_pages(spark, SF_DIR).limit(200).repartition(4).write.parquet(d)

    stream = FS.stream_pages(spark, d, max_files_per_trigger=1)
    links = FS.harvest_with_event_time(stream).select(
        "host", "canon_url", "url_sha1", "warc_ts"
    )
    sched = budgeted_schedule_stream(links, k_per_batch=5, total_budget=8)
    q = (
        sched.writeStream.format("memory")
        .queryName("budget_sched_test")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(300)
    assert len(q.recentProgress) > 1  # multiple micro-batches ran

    rows = spark.sql("SELECT * FROM budget_sched_test").collect()
    assert rows
    per_host = {}
    for r in rows:
        per_host.setdefault(r["host"], []).append((r["batch_ord"], r["host_seq"]))
    hot = per_host["hot.example.com"]
    by_batch = {}
    for bo, seq in hot:
        by_batch.setdefault(bo, []).append(seq)
    # batch 1: full k; batch 2: only what the total budget left over
    assert len(by_batch[1]) == 5
    assert len(by_batch[2]) == 3  # 8 - 5 carried across the batch edge
    assert 3 not in by_batch or len(by_batch.get(3, [])) == 0
    # host_seq is dense across batches -> state really carried
    assert sorted(s for _, s in hot) == list(range(1, 9))
    for host, pairs in per_host.items():
        assert len(pairs) <= 8, host
        assert max(s for _, s in pairs) <= 8


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Streaming session_window sessions == the batch gap>30min
    sessionizer: same per-user session count, same total events."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    d = str(tmp_path / "events_stream")
    ev.repartition(3).write.parquet(d)

    stream = spark.readStream.schema(ev.schema).parquet(d)
    sessions = FS.sessionize_stream(stream, gap="30 minutes")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessionize_stream_test")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT * FROM sessionize_stream_test").collect()
    # append mode only emits sessions the watermark closed; with a
    # bounded file source the final watermark closes all but the tail
    assert got

    batch = entry.queries()["events_sessionize"](spark, sf)
    batch_counts = {
        r["user_id"]: r["n_sessions"]
        for r in batch.groupBy("user_id")
        .agg(F.max("session_seq").alias("n_sessions"))
        .collect()
    }
    stream_counts = {}
    n_total = 0
    for r in got:
        stream_counts[r["user_id"]] = stream_counts.get(r["user_id"], 0) + 1
        n_total += r["n_events"]
    # every closed streaming session is one of the batch sessions
    for user, n in stream_counts.items():
        assert n <= batch_counts[user], user
    # most of the corpus closes (tail sessions past the watermark stay open)
    assert n_total >= ev.count() * 0.5


def test_robots_gate_on_stream(spark, tmp_path):
    """The robots broadcast-join gate composes with streaming frames
    unchanged — disallowed prefixes never reach the sink."""
    from warctools_spark.operators.robots import apply_robots

    d = str(tmp_path / "pages3")
    synthesize_pages(spark, SF_DIR).limit(100).repartition(2).write.parquet(d)
    stream = FS.stream_pages(spark, d, max_files_per_trigger=1)
    links = FS.harvest_with_event_time(stream).select(
        "host", "canon_url", "url_sha1"
    )
    robots = spark.createDataFrame(
        [("hot.example.com", [], ["/doc/"], 0)],
        "host string, allow array<string>, disallow array<string>, "
        "crawl_delay_ms int",
    )
    gated = apply_robots(links, robots)
    q = (
        gated.writeStream.format("memory")
        .queryName("robots_stream_test")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM robots_stream_test").collect()
    assert rows
    assert all(r["host"] != "hot.example.com" for r in rows)


def test_change_rate_tracker_across_batches(spark, tmp_path):
    """Streaming freshness scheduler: state (count/first/last) must
    accumulate across micro-batches, and the final next_due must equal
    the batch recrawl formula over ALL events, not just the last
    batch's."""
    import pandas as pd

    from warctools_spark.streaming.stateful import track_change_rate

    d = tmp_path / "changes"
    d.mkdir()
    # batch 1: entity a at t=0h,2h ; entity b at t=0h
    pd.DataFrame(
        {"entity": ["a", "a", "b"], "ts_us": [0, 7_200_000_000, 0]}
    ).to_parquet(d / "b1.parquet")
    # batch 2: entity a at t=6h -> interval becomes (6h-0)/2 = 3h
    pd.DataFrame(
        {"entity": ["a"], "ts_us": [21_600_000_000]}
    ).to_parquet(d / "b2.parquet")

    stream = (
        spark.readStream.schema("entity string, ts_us long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    out = track_change_rate(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("change_rate_test")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .outputMode("update")
        .start()
    )
    q.awaitTermination(300)
    assert len(q.recentProgress) > 1  # really multiple micro-batches

    rows = spark.sql(
        "SELECT * FROM change_rate_test ORDER BY entity, n_changes"
    ).collect()
    final_a = [r for r in rows if r["entity"] == "a"][-1]
    # 3 events across 2 batches: interval (21.6e9-0)/2 = 10.8e9? no:
    # (last-first)/(n-1) = 21_600_000_000/2 = 10_800_000_000
    assert final_a["n_changes"] == 3
    assert final_a["next_due_us"] == 21_600_000_000 + 10_800_000_000
    final_b = [r for r in rows if r["entity"] == "b"][-1]
    assert final_b["n_changes"] == 1
    assert final_b["next_due_us"] == 3_600_000_000  # 0 + default 1h


def test_stream_frontier_durable_two_batches_and_replay(spark, tmp_path):
    """Streaming twin of the batch epoch: per-micro-batch Bloom-probe
    dedup against catalog state, snapshot commit per batch, and the
    manifest as the exactly-once barrier. A RECREATED checkpoint with
    a kept catalog is a batch-id collision, not a replay: batch ids
    restart at 0, so skipping them would re-deliver stale schedules
    and silently drop whatever the new batches contained — the stream
    must refuse (stream_id guard) and leave the catalog untouched."""
    import os

    from warctools_spark.plans.catalog import Catalog
    from warctools_spark.streaming.frontier_stream import (
        stream_frontier_durable,
    )

    def rows(ids):
        return [
            (f"{i:040x}", f"http://h{i % 3}.example.com/{i}",
             f"h{i % 3}.example.com", 1)
            for i in ids
        ]

    schema = "url_sha1 string, canon_url string, host string, depth int"
    src = str(tmp_path / "links")
    os.makedirs(src)
    # batch 0: urls 0..19; batch 1: urls 10..29 (10 overlap -> dedup)
    spark.createDataFrame(rows(range(20)), schema).coalesce(1)\
        .write.parquet(src + "/b0")
    spark.createDataFrame(rows(range(10, 30)), schema).coalesce(1)\
        .write.parquet(src + "/b1")

    cat = Catalog(str(tmp_path / "cat"), n_buckets=8)
    scheduled = {}

    def sink(df, batch_id):
        scheduled[batch_id] = sorted(
            r["url_sha1"] for r in df.select("url_sha1").collect()
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
    )
    q = stream_frontier_durable(
        stream, cat, k_per_host=100,
        checkpoint=str(tmp_path / "ckpt"), sink=sink,
    )
    q.awaitTermination(120)

    assert cat.list_epochs() == [0, 1]
    m0, m1 = cat.read_manifest(0), cat.read_manifest(1)
    assert m0["metrics"]["fresh"] == 20
    assert m1["metrics"]["fresh"] == 10  # overlap deduped vs snapshot
    total = set(scheduled[0]) | set(scheduled[1])
    assert len(scheduled[0]) == 20 and len(scheduled[1]) == 10
    assert len(total) == 30  # no url scheduled twice
    # every batch snapshot carries the filter table
    assert any(t["table"] == "bloom" for t in m1["tables"])

    # recreated checkpoint, catalog kept: batch ids restart at 0 and
    # collide with committed snapshots — these are NEW batches from a
    # DIFFERENT stream (new query id), so the guard must refuse
    # instead of misreading them as replays
    import shutil

    from pyspark.errors import StreamingQueryException

    shutil.rmtree(str(tmp_path / "ckpt"))
    before = {e: cat.read_manifest(e)["committed_at"]
              for e in cat.list_epochs()}
    q2 = stream_frontier_durable(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*"),
        cat, k_per_host=100,
        checkpoint=str(tmp_path / "ckpt2"), sink=sink,
    )
    with pytest.raises(StreamingQueryException, match="NOT a replay"):
        q2.awaitTermination(120)
        raise AssertionError("stream should have failed")
    assert cat.list_epochs() == [0, 1]  # catalog untouched
    assert {e: cat.read_manifest(e)["committed_at"]
            for e in cat.list_epochs()} == before


def test_stream_frontier_durable_redelivers_after_sink_crash(spark, tmp_path):
    """The crash window the round-4 review found: state committed but
    the process dies before sink delivery. The sink raising after
    commit fails the batch (offsets uncommitted); the restart replays
    it, finds the snapshot, and RE-DELIVERS the committed schedule —
    no recompute, no duplicate state, no lost output."""
    import os

    from warctools_spark.plans.catalog import Catalog
    from warctools_spark.streaming.frontier_stream import (
        stream_frontier_durable,
    )

    schema = "url_sha1 string, canon_url string, host string, depth int"
    src = str(tmp_path / "links")
    os.makedirs(src)
    rows = [(f"{i:040x}", f"http://h.example.com/{i}", "h.example.com", 1)
            for i in range(12)]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src + "/b0")

    cat = Catalog(str(tmp_path / "cat"), n_buckets=8)
    delivered = []

    def crashing_sink(df, batch_id):
        raise RuntimeError("sink died after commit")

    q = stream_frontier_durable(
        spark.readStream.schema(schema).parquet(src + "/b*"),
        cat, checkpoint=str(tmp_path / "ckpt"), k_per_host=100,
        sink=crashing_sink,
    )
    with pytest.raises(Exception, match="sink died"):
        q.awaitTermination(120)
    # state committed before the sink crash
    assert cat.list_epochs() == [0]
    committed_at = cat.read_manifest(0)["committed_at"]

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
    # replay re-delivered the SNAPSHOT's schedule without re-committing
    assert delivered == [(0, sorted(r[0] for r in rows))]
    assert cat.list_epochs() == [0]
    assert cat.read_manifest(0)["committed_at"] == committed_at


def test_stream_frontier_durable_expire_between_batches(
    spark, tmp_path, monkeypatch
):
    """Round-5 brief #6: expire_snapshots runs against a durable
    stream's catalog BETWEEN micro-batches. The expiry must preserve
    every seen delta the surviving snapshot references (dedup stays
    exact), a crash-replay after expiry must re-deliver the newest
    committed schedule from its snapshot, and no batch may ever
    rebuild the Bloom filter from the full seen set (restore +
    delta-only updates, exactly one build_bloom call per live batch)."""
    import os

    from warctools_spark.operators import seen as SEEN
    from warctools_spark.plans.catalog import Catalog
    from warctools_spark.streaming.frontier_stream import (
        stream_frontier_durable,
    )

    calls = []
    real_build = SEEN.build_bloom

    def counting_build(df, **kw):
        calls.append(1)
        return real_build(df, **kw)

    monkeypatch.setattr(SEEN, "build_bloom", counting_build)

    def rows(ids):
        return [
            (f"{i:040x}", f"http://h{i % 3}.example.com/{i}",
             f"h{i % 3}.example.com", 1)
            for i in ids
        ]

    schema = "url_sha1 string, canon_url string, host string, depth int"
    src = str(tmp_path / "links")
    os.makedirs(src)
    spark.createDataFrame(rows(range(20)), schema).coalesce(1)\
        .write.parquet(src + "/b0")
    spark.createDataFrame(rows(range(10, 30)), schema).coalesce(1)\
        .write.parquet(src + "/b1")

    cat = Catalog(str(tmp_path / "cat"), n_buckets=8)
    ckpt = str(tmp_path / "ckpt")
    delivered = []

    def sink(df, batch_id):
        delivered.append(
            (batch_id, sorted(r["url_sha1"] for r in df.collect()))
        )

    def run(s):
        q = stream_frontier_durable(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src + "/b*"),
            cat, checkpoint=ckpt, k_per_host=100, sink=s,
        )
        q.awaitTermination(120)

    run(sink)
    assert cat.list_epochs() == [0, 1]
    # batch 0 full build (empty seen -> restore_bloom None) + delta,
    # batch 1 restore + delta only
    n_after_two = len(calls)
    assert n_after_two == 3

    # ---- expire between micro-batches ----
    res = cat.expire_snapshots(keep_last=1)
    assert res["expired_epochs"] == [0]
    # epoch 1's snapshot references epoch 0's seen delta: it survives
    assert "seen_delta/epoch=00000" not in res["deleted_dirs"]
    assert "schedule/epoch=00000" in res["deleted_dirs"]

    # ---- next batch: sink crashes AFTER commit ----
    spark.createDataFrame(rows(range(25, 40)), schema).coalesce(1)\
        .write.parquet(src + "/b2")

    def crashing(df, batch_id):
        raise RuntimeError("sink died after commit")

    with pytest.raises(Exception, match="sink died"):
        run(crashing)
    assert cat.list_epochs() == [1, 2]
    m2 = cat.read_manifest(2)
    assert m2["metrics"]["fresh"] == 10  # 25..29 deduped vs expired-era state
    committed_at = m2["committed_at"]
    # the live batch restored the filter (no full rebuild): delta only
    assert len(calls) == n_after_two + 1

    # ---- replay after expiry: re-deliver from the snapshot ----
    run(sink)
    assert cat.list_epochs() == [1, 2]
    assert cat.read_manifest(2)["committed_at"] == committed_at
    replayed = dict(delivered)[2]
    assert replayed == sorted(f"{i:040x}" for i in range(30, 40))
    # replay did zero bloom work
    assert len(calls) == n_after_two + 1


def test_track_change_rate_cg_equals_batch(spark, tmp_path):
    """The streaming Cho & Garcia-Molina estimator folded across TWO
    micro-batches must emit, as its final row per url, exactly the
    batch change_rate output over the union of the observations."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os
    from datetime import datetime, timedelta

    from warctools_spark.operators.frontier import change_rate
    from warctools_spark.streaming.stateful import track_change_rate_cg

    def ts(s):
        return datetime(2026, 1, 1) + timedelta(seconds=s)

    rows = []
    for u in range(12):
        url = "http://h%d.example.com/p" % u
        for k in range(6):
            rows.append(
                (url, ts(u * 1000 + k * 97), "d%d" % ((u * k * k) % 3))
            )
    rows.append(("http://single.example.com/p", ts(5), "d0"))
    # split BY TIME per url: first 3 observations -> batch 1
    per_url = {}
    for r in rows:
        per_url.setdefault(r[0], []).append(r)
    batch1, batch2 = [], []
    for u_rows in per_url.values():
        u_rows.sort(key=lambda r: r[1])
        batch1.extend(u_rows[:3])
        batch2.extend(u_rows[3:])

    d = tmp_path / "obs"
    d.mkdir()

    def write(path, data):
        tbl = pa.table(
            {
                "url": [r[0] for r in data],
                "ts_us": [int(r[1].timestamp() * 1_000_000) for r in data],
                "digest": [r[2] for r in data],
            }
        )
        pq.write_table(tbl, path)

    write(str(d / "b1.parquet"), batch1)
    write(str(d / "b2.parquet"), batch2)
    now = 1_800_000_000
    os.utime(str(d / "b1.parquet"), (now, now))
    os.utime(str(d / "b2.parquet"), (now + 100, now + 100))

    stream = (
        spark.readStream.schema("url string, ts_us long, digest string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        track_change_rate_cg(stream)
        .writeStream.format("memory")
        .queryName("cg_rate_test")
        .option("checkpointLocation", str(tmp_path / "ckpt_cg"))
        .trigger(availableNow=True)
        .outputMode("update")
        .start()
    )
    q.awaitTermination(300)
    assert len(q.recentProgress) > 1  # genuinely multiple micro-batches

    out = spark.sql("SELECT * FROM cg_rate_test").collect()
    final = {}
    for r in out:
        if r.url not in final or r.n_obs > final[r.url].n_obs:
            final[r.url] = r
    got = {u: tuple(r)[1:] for u, r in final.items()}

    obs_df = spark.createDataFrame(
        [(r[0], r[1], r[2]) for r in rows], "url string, ts timestamp, digest string"
    )
    want = {r.url: tuple(r)[1:] for r in change_rate(obs_df).collect()}
    assert got == want
