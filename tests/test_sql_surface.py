"""Pure-SQL access to the engine: registered UDFs + corrupt-input
robustness of the ingest path."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from warctools_spark.functions.sql import register_sql_functions
from warctools_spark.sources.pages import synthesize_pages


def test_sql_surface(spark):
    names = register_sql_functions(spark)
    assert "extract_text" in names and "url_sha1" in names
    synthesize_pages(spark, SF_DIR).limit(50).createOrReplaceTempView("pages_v")
    rows = spark.sql(
        """
        SELECT url,
               extract_text(html) AS text,
               decode_http(html).code AS code,
               url_sha1(url) AS sha1,
               url_host(url) AS host,
               size(extract_links(url, html)) AS n_links
        FROM pages_v
        """
    ).collect()
    assert len(rows) == 50
    assert all(r["code"] == 200 for r in rows)
    assert all(r["n_links"] == 8 for r in rows)
    assert all(len(r["sha1"]) == 40 for r in rows)
    # SQL extract_text == the oracle text column
    check = spark.sql(
        "SELECT count(*) AS bad FROM pages_v WHERE extract_text(html) != text"
    ).collect()[0]
    assert check["bad"] == 0


def test_ingest_corrupt_files(spark, tmp_path):
    """Garbage and truncated-gzip inputs become error rows, never
    job failures (errors-are-data contract at ingest)."""
    from warctools_spark.sources.warc import read_warc

    (tmp_path / "garbage.warc").write_bytes(b"\x00\x01\x02 not a warc at all\n" * 5)
    (tmp_path / "trunc.warc.gz").write_bytes(b"\x1f\x8b\x08\x00TRUNCATED")
    ok = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    (tmp_path / "fine.warc").write_bytes(ok)

    df = read_warc(spark, str(tmp_path)).cache()
    rows = df.collect()
    # the good record parsed; the bad files produced error rows
    good = [r for r in rows if not r["errors"]]
    bad = [r for r in rows if r["errors"]]
    assert any(r["record_type"] == "warcinfo" for r in good)
    assert len(bad) >= 2
    from warctools_spark.operators.archive_ops import warc_valid

    invalid_files = {r["source_file"] for r in warc_valid(df).collect()}
    assert len(invalid_files) == 2
