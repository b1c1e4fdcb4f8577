"""Raw .warc/.arc(.gz) file ingest -> records DataFrame.

The Spark-native equivalent of open_record_stream + read_records
(/root/reference/hanzo/warctools/stream.py:8-102): files are read with
the binaryFile source (one row per file, distributed by Spark's file
listing) and split into record rows by the parse kernel inside
mapInPandas — a UDTF-shaped 1 file -> N records expansion over Arrow
batches.

Scale note: binaryFile materializes each file as one row, so WARC
inputs should be the usual ~1 GB crawl segments; thousands of files
spread across executors, one task per file. Offsets are exact
(byte offsets in plain files, gzip member offsets in .warc.gz), which
preserves the (filename, offset) CDX addressing scheme of warcindex
(warcindex.py:42-48).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from warctools_spark.kernels.warc_parse import parse_archive

RECORDS_SCHEMA = (
    "source_file string, offset bigint, format string, version string, "
    "record_type string, url string, warc_date string, record_id string, "
    "content_type string, content_length bigint, content binary, "
    "headers array<struct<name:string,value:string>>, errors array<string>"
)


def _rows_for_file(path: str, data: bytes, fmt: str):
    for rec in parse_archive(bytes(data), fmt=fmt):
        yield {
            "source_file": path,
            "offset": rec.offset,
            "format": rec.format,
            "version": rec.version.decode("latin-1") if rec.version else None,
            "record_type": (
                rec.record_type.decode("latin-1") if rec.record_type else None
            ),
            "url": rec.url.decode("latin-1") if rec.url else None,
            "warc_date": rec.date.decode("latin-1") if rec.date else None,
            "record_id": rec.record_id.decode("latin-1") if rec.record_id else None,
            "content_type": (
                rec.content_type.decode("latin-1") if rec.content_type else None
            ),
            "content_length": rec.content_length,
            "content": rec.content,
            "headers": [
                {"name": k.decode("latin-1"), "value": v.decode("latin-1")}
                for k, v in rec.headers
            ],
            "errors": [str(e) for e in rec.errors],
        }


def read_warc(
    spark: SparkSession, paths: str | list[str], fmt: str = "auto"
) -> DataFrame:
    """Read (W)ARC files into a records DataFrame.

    fmt: 'auto' (magic + first-line sniff, archive_detect.py:10-27),
    'warc', 'arc', or 'mixed' (per-record dispatch, mixed.py:12-28).
    """
    if isinstance(paths, str):
        paths = [paths]
    files = spark.read.format("binaryFile").load(paths)

    def parse(batches):
        for pdf in batches:
            out = []
            for path, data in zip(pdf["path"], pdf["content"]):
                out.extend(_rows_for_file(path, data, fmt))
            yield pd.DataFrame(
                out,
                columns=[
                    "source_file",
                    "offset",
                    "format",
                    "version",
                    "record_type",
                    "url",
                    "warc_date",
                    "record_id",
                    "content_type",
                    "content_length",
                    "content",
                    "headers",
                    "errors",
                ],
            )

    return files.select("path", "content").mapInPandas(parse, RECORDS_SCHEMA)


def expand_files(spark: SparkSession, paths: str | list[str]) -> list[str]:
    """Spark-native twin of the reference's input expansion
    (hanzo/warctools/__init__.py:8-14 `expand_files` +
    hanzo/warctools/s3.py:38-55 `list_files` marker pagination).

    Every path is resolved through the Hadoop FileSystem of its scheme
    — s3a://, hdfs://, file:// or bare local paths — so the paginated
    bucket LIST the reference hand-rolls with boto markers is done by
    the JVM connector (S3A issues ListObjectsV2 with continuation
    tokens). Globs expand via globStatus; directories expand to their
    (non-hidden) files recursively; plain files pass through. Returns
    a sorted, de-duplicated list of fully-qualified URIs, so CLI runs
    are deterministic regardless of listing order.
    """
    if isinstance(paths, str):
        paths = [paths]
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    out: list[str] = []

    def _add_file_or_dir(fs, status):
        if status.isDirectory():
            it = fs.listFiles(status.getPath(), True)  # recursive
            while it.hasNext():
                f = it.next()
                name = f.getPath().getName()
                if not name.startswith(("_", ".")):
                    out.append(f.getPath().toString())
        else:
            out.append(status.getPath().toString())

    for p in paths:
        jpath = jvm.org.apache.hadoop.fs.Path(p)
        fs = jpath.getFileSystem(hconf)
        statuses = fs.globStatus(jpath)
        if statuses is None or len(statuses) == 0:
            # keep unmatched inputs verbatim: downstream load() raises
            # the standard path-not-found error with the user's string
            out.append(p)
            continue
        for st in statuses:
            _add_file_or_dir(fs, st)
    return sorted(set(out))
