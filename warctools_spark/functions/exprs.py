"""JVM-side column expression helpers — everything here stays inside
whole-stage codegen (no Python in the hot path).

These are the Spark built-ins for reference scalar behaviors
(SURVEY.md §2.10): block digests, WARC date strings, host bucketing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def block_digest_col(content: Column) -> Column:
    """'sha256:' + hexdigest (warc.py:139-144) — built-in sha2."""
    return F.concat(F.lit("sha256:"), F.sha2(content, 256))


def warc_date_str(ts: Column) -> Column:
    """ISO-8601 'Z' with sub-seconds truncated (warc.py:361-365)."""
    return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")


def host_bucket(host: Column, num_buckets: int) -> Column:
    """Stable host-hash bucket for co-located storage + joins."""
    return F.pmod(F.xxhash64(host), F.lit(num_buckets)).cast("int")


def portable_hash60(col: Column, seed: str) -> Column:
    """First 60 bits of md5(seed:value) as a non-negative long — THE
    repo-standard engine-portable seeded hash, shared by the sampling,
    DSIR, and sketch families (DuckDB oracle replica:
    CAST(('0x' || substr(md5(seed || ':' || v), 1, 15)) AS BIGINT)).
    Any change here must change the oracle replicas in lockstep.
    (dedup.shingle_hashes is the related UNSEEDED variant with its own
    modulus — deliberately not this function.)"""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + ":"), col.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
