"""Structured Streaming variants of the frontier pipeline.

The batch engine models epochs as snapshot commits (plans/epoch.py —
the design SURVEY §1.4 chose); this module provides the continuous
variants for deployments that want a standing ingest:

* stream_pages: file-source stream over a pages directory (new
  parquet files = newly fetched pages)
* harvest_stream: the same fused harvest UDF — pandas UDFs work
  unchanged on streaming frames
* dedup_stream: stateful exact URL dedup via dropDuplicates on
  url_sha1 with an event-time watermark bounding state
* host_metrics_stream: per-host windowed crawl metrics with late-data
  handling (watermark + tumbling window)
* schedule_micro_batches: politeness top-k needs a ranking window,
  which streaming cannot express globally — foreachBatch applies the
  exact batch operator per micro-batch, which is precisely the epoch
  semantics (one micro-batch = one scheduling round)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warctools_spark.operators.frontier import politeness_schedule
from warctools_spark.sources.pages import PAGES_SCHEMA


def stream_pages(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(PAGES_SCHEMA).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def harvest_with_event_time(pages: DataFrame) -> DataFrame:
    """Harvest keeping the page's warc_ts as link event time (needed
    for watermarked stateful dedup)."""
    from warctools_spark.functions.udfs import udf_harvest_canon

    exploded = pages.select(
        F.col("url").alias("src_url"),
        F.col("warc_ts"),
        F.explode(udf_harvest_canon(F.col("url"), F.col("html"))).alias("l"),
    )
    return exploded.select(
        "src_url",
        "warc_ts",
        F.col("l.link").alias("link"),
        F.col("l.canon_url").alias("canon_url"),
        F.col("l.url_sha1").alias("url_sha1"),
        F.col("l.host").alias("host"),
    )


def dedup_stream(links: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful exact URL-seen dedup: dropDuplicates keyed on url_sha1;
    the watermark bounds state (urls older than the watermark are
    evictable — at 10^10 scale the state store holds only the horizon,
    the snapshot tables hold history)."""
    return links.withWatermark("warc_ts", watermark).dropDuplicates(["url_sha1"])


def host_metrics_stream(
    links: DataFrame, window: str = "10 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Per-host discovery counts in event-time windows — the streaming
    twin of the per-epoch lineage metrics."""
    return (
        links.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "host")
        .agg(
            F.count("*").alias("discovered"),
            F.approx_count_distinct("url_sha1").alias("approx_unique"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "host",
            "discovered",
            "approx_unique",
        )
    )


def schedule_micro_batches(
    links: DataFrame,
    k_per_host: int,
    sink,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """foreachBatch politeness scheduling: each micro-batch is one
    scheduling round — the exact batch operator (salted, skew-proof)
    applied to the batch's candidates. `sink(batch_df, batch_id)` is
    invoked with the scheduled rows."""

    def _process(batch_df, batch_id):
        sched = politeness_schedule(
            batch_df.withColumn("depth", F.lit(1)),
            k_per_host,
            salt_all=True,
        )
        sink(sched, batch_id)

    writer = links.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Streaming twin of the batch sessionizer (__spark_entry__
    events_sessionize): Spark's native session_window merges events
    closer than `gap` into one growing window per user; the watermark
    bounds state and closes sessions once event time passes
    session-end + watermark. Emits one row per closed session with
    start/end and event count — the aggregate view of the batch
    session_seq assignment (same gap semantics, so per-user session
    counts match the batch query's max(session_seq))."""
    # watermarks require TIMESTAMP (with timezone); parquet NTZ casts
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), user_col)
        .agg(F.count("*").alias("n_events"))
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
