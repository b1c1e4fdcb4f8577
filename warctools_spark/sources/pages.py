"""Deterministic synthetic `pages` table (BASELINE.json input_hint:
url:string, warc_ts:timestamp, html:binary, text:string, lang:string).

Derived 1:1 from the driver's documents.parquet — no wall-clock, no
randomness — so every run (and the DuckDB oracle) sees identical rows.
The html column is a full HTTP/1.x response (status line + headers +
body) wrapping an HTML document whose body text is the document text
and whose outlinks form a deterministic graph over the other pages.

The wire-format variant cycles doc_id % 4 through the reference's
payload decode matrix (messaging.py):
  0: plain Content-Length        1: Content-Encoding: gzip
  2: Transfer-Encoding: chunked  3: chunked + gzip

The `text` column is the byte-parity oracle: decoding `html` with the
engine (or with the reference's ResponseMessage.get_body + inflate)
must reproduce it byte-identically.

Host layout is Zipf-ish with one deliberately hot host (~30% of urls)
to exercise politeness-window salting at scale.
"""

from __future__ import annotations

import gzip as _gzip
from datetime import datetime, timedelta, timezone

import pandas as pd

EPOCH = datetime(2013, 11, 13, 0, 0, 0, tzinfo=timezone.utc)
HOT_HOST = "hot.example.com"
N_LINKS = 8


def host_for(doc_id: int) -> str:
    if doc_id % 10 < 3:
        return HOT_HOST
    return "src%d.example.com" % (doc_id % 20)


def url_for(doc_id: int) -> str:
    return "http://%s/doc/%d.html" % (host_for(doc_id), doc_id)


def link_targets(doc_id: int, n_docs: int) -> list[int]:
    return [(doc_id * 31 + i * 97 + 7) % n_docs for i in range(N_LINKS)]


def html_doc(doc_id: int, text: str, n_docs: int) -> str:
    links = "".join(
        '<a href="%s">link %d</a>\n' % (url_for(t), i)
        for i, t in enumerate(link_targets(doc_id, n_docs))
    )
    return (
        "<html><head><title>Doc %d</title></head><body><p>%s</p>\n%s</body></html>"
        % (doc_id, text, links)
    )


def _chunk(body: bytes, size: int = 512) -> bytes:
    out = bytearray()
    for i in range(0, len(body), size):
        c = body[i : i + size]
        out += ("%x" % len(c)).encode() + b"\r\n" + c + b"\r\n"
    out += b"0\r\n\r\n"
    return bytes(out)


def http_response(doc_id: int, doc: str) -> bytes:
    body = doc.encode("utf-8")
    variant = doc_id % 4
    head = [b"HTTP/1.1 200 OK", b"Content-Type: text/html; charset=utf-8"]
    if variant == 0:
        head.append(b"Content-Length: " + str(len(body)).encode())
        payload = body
    elif variant == 1:
        gz = _gzip.compress(body, mtime=0)
        head.append(b"Content-Encoding: gzip")
        head.append(b"Content-Length: " + str(len(gz)).encode())
        payload = gz
    elif variant == 2:
        head.append(b"Transfer-Encoding: chunked")
        payload = _chunk(body)
    else:
        gz = _gzip.compress(body, mtime=0)
        head.append(b"Transfer-Encoding: chunked")
        head.append(b"Content-Encoding: gzip")
        payload = _chunk(gz)
    return b"\r\n".join(head) + b"\r\n\r\n" + payload


def pages_pdf(docs: pd.DataFrame, n_docs: int) -> pd.DataFrame:
    """documents batch -> pages batch (vectorized building block used
    both by the Spark mapInPandas path and by pure-pandas tests)."""
    rows = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
    for doc_id, text, lang in zip(docs["doc_id"], docs["text"], docs["lang"]):
        doc_id = int(doc_id)
        doc = html_doc(doc_id, text, n_docs)
        rows["url"].append(url_for(doc_id))
        rows["warc_ts"].append(EPOCH + timedelta(seconds=doc_id))
        rows["html"].append(http_response(doc_id, doc))
        rows["text"].append(doc)
        rows["lang"].append(lang)
    return pd.DataFrame(rows)


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


# ---- the same URL model as JVM column expressions (for oracle-checked
# queries that model the corpus numerically) ----

def host_expr(doc_id):
    """host_for() as a Catalyst expression."""
    from pyspark.sql import functions as F

    return F.when(doc_id % 10 < 3, F.lit(HOT_HOST)).otherwise(
        F.concat(F.lit("src"), (doc_id % 20).cast("string"), F.lit(".example.com"))
    )


def url_expr(doc_id):
    """url_for() as a Catalyst expression."""
    from pyspark.sql import functions as F

    return F.concat(
        F.lit("http://"),
        host_expr(doc_id),
        F.lit("/doc/"),
        doc_id.cast("string"),
        F.lit(".html"),
    )


def synthesize_pages(
    spark, sf_dir: str, expand: int = 1, repartition: int | None = None
):
    """documents.parquet -> pages DataFrame, distributed via
    mapInPandas (each executor synthesizes its partition; only the
    row count crosses the driver).

    expand=E replicates the corpus deterministically to E*n_docs pages
    (page_id = doc_id + j*n_docs reuses doc j's text) — the bench knob
    that scales input size independently of the driver's sf tier.
    expand=1 is the oracle-checked identity layout.
    """
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    n_pages = n_docs * expand
    base = docs.select("doc_id", "text", "lang")
    if expand > 1:
        base = base.withColumn(
            "j", F.explode(F.sequence(F.lit(0), F.lit(expand - 1)))
        ).select(
            (F.col("doc_id") + F.col("j") * n_docs).alias("doc_id"),
            "text",
            "lang",
        )
    if repartition:
        base = base.repartition(repartition)

    def gen(batches):
        for pdf in batches:
            yield pages_pdf(pdf, n_pages)

    return base.mapInPandas(gen, PAGES_SCHEMA)
