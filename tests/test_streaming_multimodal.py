"""Structured Streaming frontier + multimodal plumbing tests."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from warctools_spark.operators import multimodal as MM
from warctools_spark.sources.pages import synthesize_pages
from warctools_spark.streaming import frontier_stream as FS


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages_stream"))
    synthesize_pages(spark, SF_DIR).repartition(4).write.mode("overwrite").parquet(d)
    return d


def test_streaming_harvest_dedup_matches_batch(spark, pages_dir, tmp_path):
    stream = FS.stream_pages(spark, pages_dir)
    assert stream.isStreaming
    links = FS.harvest_with_event_time(stream)
    deduped = FS.dedup_stream(links)

    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream_test")
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT count(DISTINCT url_sha1) c, count(*) n FROM dedup_stream_test").collect()[0]

    batch_pages = spark.read.parquet(pages_dir)
    batch_links = FS.harvest_with_event_time(batch_pages)
    expected = batch_links.select("url_sha1").distinct().count()
    assert got["n"] == got["c"] == expected


def test_streaming_host_metrics(spark, pages_dir, tmp_path):
    stream = FS.stream_pages(spark, pages_dir)
    metrics = FS.host_metrics_stream(
        FS.harvest_with_event_time(stream), window="1 hour"
    )
    # append mode only emits windows the watermark has passed; with a
    # bounded availableNow run the last windows stay open, so the test
    # reads the aggregation in complete mode
    q = (
        metrics.writeStream.format("memory")
        .queryName("host_metrics_test")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .outputMode("complete")
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM host_metrics_test").collect()
    assert rows
    hosts = {r["host"] for r in rows}
    assert "hot.example.com" in hosts
    assert all(r["discovered"] > 0 for r in rows)


def test_streaming_schedule_micro_batches(spark, pages_dir, tmp_path):
    collected = []

    def sink(df, batch_id):
        collected.append((batch_id, df.groupBy("host").count().collect()))

    stream = FS.stream_pages(spark, pages_dir, max_files_per_trigger=2)
    links = FS.harvest_with_event_time(stream)
    q = FS.schedule_micro_batches(
        links, k_per_host=5, sink=sink, checkpoint=str(tmp_path / "ckpt3")
    )
    q.awaitTermination(300)
    assert collected
    for _bid, counts in collected:
        assert all(r["count"] <= 5 for r in counts)


# ---- multimodal ----


@pytest.fixture(scope="module")
def media(spark):
    df = MM.synthesize_media(spark, SF_DIR).cache()
    df.count()
    return df


def test_media_schema_and_meta(media):
    assert media.schema["blob"].dataType.typeName() == "binary"
    decoded = MM.decode_image_meta(media)
    rows = decoded.collect()
    assert all(r["image"]["ok"] for r in rows)
    assert all(r["image"]["width"] == 8 for r in rows)  # 64-dim -> 8x8


def test_media_bad_blob_is_error_row(spark, media):
    import pandas as pd

    bad = spark.createDataFrame(
        [(999, "img1", bytearray(b"NOPE"), ("image/x-img1", 4))],
        MM.MEDIA_SCHEMA,
    )
    decoded = MM.decode_image_meta(media.unionByName(bad))
    assert decoded.where(~F.col("image.ok")).count() == 1


def test_real_codec_is_stubbed(spark):
    bad = spark.createDataFrame(
        [(1, "image", bytearray(b"\x89PNG..."), ("image/png", 8))],
        MM.MEDIA_SCHEMA,
    )
    # NotImplementedError inside the codec -> ok=false row, not a crash
    decoded = MM.decode_image_meta(bad)
    assert decoded.collect()[0]["image"]["ok"] is False


def test_image_features(media):
    feats = MM.image_features(media)
    rows = feats.collect()
    assert all(r["features"] is not None and len(r["features"]) == 10 for r in rows)


def test_resize_and_frame_sample(media, spark):
    resized = MM.resize_stub(media.limit(10), 4, 4)
    rows = resized.collect()
    assert all(r["blob"] is not None for r in rows)
    d = MM._decode_img1(bytes(rows[0]["blob"]))
    assert (d["width"], d["height"]) == (4, 4)
    frames = MM.frame_sample_stub(media.limit(5), every_n=10)
    assert frames.count() == 5 * 3


def test_audio_features(spark):
    """AUD1 plumbing: synthesize from embeddings, decode, features."""
    from warctools_spark.operators.multimodal import (
        audio_features,
        synthesize_audio,
    )

    audio = synthesize_audio(spark, SF_DIR)
    feats = audio_features(audio)
    rows = feats.collect()
    assert len(rows) == spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    for r in rows[:20]:
        assert r["sample_rate"] == 16000
        assert r["n_samples"] == 64
        assert 0 < r["rms"] <= 1.0
        assert abs(r["peak"] - 1.0) < 1e-3  # scaled to full scale
        assert 0 <= r["zcr"] <= 1


def test_sniff_mime_on_media_and_real_magics(spark):
    from pyspark.sql import functions as F

    from warctools_spark.operators.multimodal import sniff_mime, synthesize_media

    media = synthesize_media(spark, SF_DIR).limit(10)
    sniffed = media.select(sniff_mime("blob").alias("mime")).distinct().collect()
    assert {r["mime"] for r in sniffed} == {"image/x-img1"}

    blobs = spark.createDataFrame(
        [
            (1, bytearray(b"\x89PNG\r\n\x1a\n....")),
            (2, bytearray(b"\xff\xd8\xff\xe0JFIF")),
            (3, bytearray(b"%PDF-1.4 ...")),
            (4, bytearray(b"AUD1\x00\x01 payload")),
            (5, bytearray(b"just plain text")),
        ],
        "i long, blob binary",
    )
    got = {r["i"]: r["mime"] for r in blobs.select("i", sniff_mime("blob").alias("mime")).collect()}
    assert got == {
        1: "image/png",
        2: "image/jpeg",
        3: "application/pdf",
        4: "audio/x-aud1",
        5: "application/octet-stream",
    }
