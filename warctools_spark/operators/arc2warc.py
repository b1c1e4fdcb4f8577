"""arc2warc conversion as a DataFrame transform.

Clone of the reference ArcTransformer record path
(/root/reference/hanzo/arc2warc.py:51-178) over the records frame:

* deterministic id: uuid from sha1(url+date) (arc2warc.py:60-62)
* date normalization %Y%m%d%H%M%S with %Y%m%d fallback
  (arc2warc.py:129-136)
* IP header kept unless 0.0.0.0 (arc2warc.py:138-143)
* empty content-type -> application/octet-stream (arc2warc.py:152-153)
* record-type inference (arc2warc.py:155-174): resource/response
  prefix lists, http* + parseable-http-response sniff, dns text check
* WARC date string (warc.py:361-365)

The type inference needs the http-response sniff (a kernel call), so
the whole row transform runs in one pandas UDF struct; everything
else it produces is plain columns.
"""

from __future__ import annotations

from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from warctools_spark.kernels.http_decode import decode_http
from warctools_spark.kernels.warc_write import warc_datetime_str, warc_uuid

A2W_STRUCT = T.StructType(
    [
        T.StructField("warc_id", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("ip_address", T.StringType()),
    ]
)


def _is_http_response(content: bytes) -> bool:
    """arc2warc.py:44-48."""
    res = decode_http(content, kind="response")
    return res.complete and not res.leftover


def _convert_one(url, date, content_type, content, ip, resources, responses):
    url_b = (url or "").encode("latin-1")
    date_b = (date or "").encode("latin-1")
    warc_id = warc_uuid(url_b + date_b).decode("ascii")

    if date:
        try:
            d = datetime.strptime(date, "%Y%m%d%H%M%S")
        except ValueError:
            d = datetime.strptime(date, "%Y%m%d")
        warc_date = warc_datetime_str(d).decode("ascii")
    else:
        warc_date = None  # reference uses now(); we refuse wall-clock

    ct = (content_type or "").strip()
    if not ct:
        ct = "application/octet-stream"

    lurl = (url or "").lower()
    if any(lurl.startswith(p) for p in resources):
        rtype = "resource"
    elif any(lurl.startswith(p) for p in responses):
        rtype = "response"
    elif lurl.startswith("http"):
        if content is not None and _is_http_response(bytes(content)):
            ct = "application/http;msgtype=response"
            rtype = "response"
        else:
            rtype = "resource"
    elif lurl.startswith("dns"):
        body = bytes(content) if content is not None else b""
        if ct.startswith("text/dns") and body.decode("ascii", "ignore").encode(
            "ascii", "ignore"
        ) == body:
            rtype = "resource"
        else:
            rtype = "response"
    else:
        rtype = "response"

    ip_out = None
    if ip:
        ip = ip.strip()
        if ip != "0.0.0.0":
            ip_out = ip
    return warc_id, warc_date, rtype, ct, ip_out


def arc_to_warc(
    records: DataFrame, resources: tuple = (), responses: tuple = ()
) -> DataFrame:
    """ARC records frame -> WARC-typed columns (+ original content).
    Input: the frame from sources/warc.read_warc over .arc files."""

    @pandas_udf(A2W_STRUCT)
    def conv(
        url: pd.Series, date: pd.Series, ctype: pd.Series, content: pd.Series,
        ip: pd.Series,
    ) -> pd.DataFrame:
        rows = {k: [] for k in ("warc_id", "warc_date", "warc_type", "content_type", "ip_address")}
        for u, d, ct, c, i in zip(url, date, ctype, content, ip):
            wid, wdate, wtype, wct, wip = _convert_one(
                u, d, ct, c, i, resources, responses
            )
            rows["warc_id"].append(wid)
            rows["warc_date"].append(wdate)
            rows["warc_type"].append(wtype)
            rows["content_type"].append(wct)
            rows["ip_address"].append(wip)
        return pd.DataFrame(rows)

    ip_col = F.expr(
        "get(filter(headers, h -> lower(h.name) = 'ip-address'), 0).value"
    )
    data = records.where(F.col("format") == "arc").withColumn(
        "w",
        conv(
            F.col("url"),
            F.col("warc_date"),
            F.col("content_type"),
            F.col("content"),
            ip_col,
        ),
    )
    return data.select(
        F.col("w.warc_id").alias("warc_id"),
        F.col("w.warc_date").alias("warc_date_out"),
        F.col("w.warc_type").alias("warc_type"),
        F.col("w.content_type").alias("content_type_out"),
        F.col("w.ip_address").alias("ip_address"),
        F.col("url"),
        F.col("content"),
        F.col("source_file"),
        F.col("offset"),
    )


def pair_request_response(records: DataFrame) -> DataFrame:
    """request<->response pairing via WARC-Concurrent-To self-join
    (the implicit join of warc.py:289-320 make_request/make_response)."""
    concurrent_to = F.expr(
        "get(filter(headers, h -> lower(h.name) = 'warc-concurrent-to'), 0).value"
    )
    responses = records.where(F.col("record_type") == "response").select(
        F.col("record_id").alias("response_id"),
        F.col("url").alias("url"),
        concurrent_to.alias("concurrent_to"),
    )
    requests = records.where(F.col("record_type") == "request").select(
        F.col("record_id").alias("request_id"),
        concurrent_to.alias("req_concurrent_to"),
    )
    # either side may carry the Concurrent-To pointer
    a = responses.join(
        requests, responses["concurrent_to"] == requests["request_id"], "inner"
    ).select("url", "response_id", "request_id")
    b = responses.join(
        requests, requests["req_concurrent_to"] == responses["response_id"], "inner"
    ).select("url", "response_id", "request_id")
    return a.unionByName(b).distinct()


def resolve_revisits(records: DataFrame) -> DataFrame:
    """revisit -> canonical response resolution via payload-digest
    self-join + row_number (SURVEY §2.6: WARC-Payload-Digest + revisit
    profile, warc.py:25,49)."""
    from pyspark.sql import Window

    digest = F.expr(
        "get(filter(headers, h -> lower(h.name) = 'warc-payload-digest'), 0).value"
    )
    responses = records.where(F.col("record_type") == "response").select(
        digest.alias("payload_digest"),
        F.col("record_id").alias("canonical_id"),
        F.col("warc_date").alias("canonical_date"),
    )
    w = Window.partitionBy("payload_digest").orderBy(
        "canonical_date", "canonical_id"
    )
    canonical = (
        responses.where(F.col("payload_digest").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    revisits = records.where(F.col("record_type") == "revisit").select(
        digest.alias("payload_digest"),
        F.col("record_id").alias("revisit_id"),
        F.col("url"),
    )
    return revisits.join(canonical, on="payload_digest", how="left")
