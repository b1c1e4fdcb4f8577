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
