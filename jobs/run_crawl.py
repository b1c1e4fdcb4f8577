"""Production crawl job — submitted as
  spark-submit --py-files engine.zip jobs/run_crawl.py \\
      --pages <parquet> --seeds <parquet|csv of urls> \\
      --catalog <dir> --epochs N --k-per-host K [--bloom]

Runs N frontier epochs over the pages corpus, committing one snapshot
(+ per-partition lineage) per epoch to the catalog; safe to re-submit:
it resumes from the latest committed epoch.
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--seeds", required=True)
    ap.add_argument("--catalog", required=True)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--k-per-host", type=int, default=10)
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--bloom", action="store_true")
    ap.add_argument("--hot-host-threshold", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from warctools_spark.plans.catalog import Catalog
    from warctools_spark.plans.epoch import (
        init_state,
        partition_lineage,
        resume_state,
        run_epoch,
    )

    spark = SparkSession.builder.appName("warctools_spark_crawl").getOrCreate()
    pages = spark.read.parquet(args.pages)
    catalog = Catalog(args.catalog, n_buckets=args.n_buckets)

    resumed = resume_state(spark, catalog)
    if resumed is not None:
        start_epoch, queue, seen = resumed
        start_epoch += 1
        print(json.dumps({"resumed_from_epoch": start_epoch - 1}))
    else:
        if args.seeds.endswith(".parquet"):
            seeds = spark.read.parquet(args.seeds)
        else:
            seeds = spark.read.text(args.seeds).withColumnRenamed("value", "url")
        queue, seen = init_state(seeds)
        start_epoch = 0

    for e in range(start_epoch, start_epoch + args.epochs):
        result = run_epoch(
            spark,
            pages,
            queue,
            seen,
            epoch=e,
            k_per_host=args.k_per_host,
            use_bloom=args.bloom,
            hot_host_threshold=args.hot_host_threshold,
            n_buckets=args.n_buckets,
        )
        queue, seen = result.queue, result.seen
        tables = [
            catalog.write_table(result.schedule, "schedule", e),
            catalog.write_table(queue, "queue", e),
            catalog.write_table(seen, "seen", e, bucket_col=None),
        ]
        result.metrics["lineage"] = partition_lineage(result.schedule)
        catalog.commit(e, tables, result.metrics)
        queue = catalog.read_table(spark, "queue", e)
        seen = catalog.read_table(spark, "seen", e).select("url_sha1")
        print(json.dumps(result.metrics))
        if result.metrics["queue_size"] == 0:
            break

    spark.stop()


if __name__ == "__main__":
    main()
