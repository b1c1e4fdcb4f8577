"""Content-defined chunking for binary payload dedup (FastCDC: Xia
et al., USENIX ATC 2016; the Gear rolling hash is from Ddelta, Xia
2014). Fixed-size chunking breaks on INSERTION — one byte shifts
every later boundary, so nothing dedups; CDC cuts where a rolling
hash of the content hits a mask, so an edit only disturbs the chunks
it touches and identical media/payload regions dedup across WARC
records, crawls, and hosts regardless of alignment. This is the
binary twin of the text-side segment/substring dedup family.

Kernel spec (deterministic, engine-independent):
  * Gear table: 256 x 64-bit values, entry i = the first 8 bytes of
    md5(byte(i)) big-endian — a published-recipe constant, no RNG.
  * rolling hash h = (h << 1 + gear[b]) mod 2^64, reset per chunk.
  * FastCDC normalized chunking: skip min_size bytes outright, use a
    HARDER mask (avg_bits + 2 one-bits) before avg_size and an
    EASIER one (avg_bits - 2) after, cut at max_size regardless.
    Cut when (h & mask) == 0 after consuming a byte.
  * final chunk is whatever remains (may be < min_size).

The per-byte loop is a Python kernel behind an Arrow batch boundary —
the same seam as kernels/warc_parse (the production path for a JVM/
native gear kernel is this exact mapInPandas signature). Chunk rows
carry (offset, length, sha256) so downstream dedup is plain
DataFrame work: `cdc_dedup_stats` is one hash agg.

Like bpe_train and the WAV codec, the chunker itself is not
SQL-expressible; evidence is property-based (reconstruction, size
bounds, determinism) plus the defining CDC property, pinned by test:
prepending bytes to a payload leaves the trailing chunk-hash
sequence IDENTICAL — fixed-size chunking provably fails that test.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GEAR = [
    int.from_bytes(hashlib.md5(bytes([i])).digest()[:8], "big")
    for i in range(256)
]
_M64 = (1 << 64) - 1


def cdc_boundaries(
    data: bytes, min_size: int = 256, avg_size: int = 1024, max_size: int = 4096
) -> list[int]:
    """Cut positions (exclusive chunk ends) for one payload. Pure
    function of (data, sizes)."""
    if not min_size <= avg_size <= max_size:
        raise ValueError("need min_size <= avg_size <= max_size")
    bits = avg_size.bit_length() - 1
    mask_s = (1 << (bits + 2)) - 1
    mask_l = (1 << max(bits - 2, 1)) - 1
    n = len(data)
    cuts = []
    i = 0
    while i < n:
        if n - i <= min_size:
            cuts.append(n)
            break
        center = min(i + avg_size, n)
        end = min(i + max_size, n)
        h = 0
        k = i + min_size
        cut = None
        while k < center:
            h = ((h << 1) + _GEAR[data[k]]) & _M64
            k += 1
            if (h & mask_s) == 0:
                cut = k
                break
        if cut is None:
            while k < end:
                h = ((h << 1) + _GEAR[data[k]]) & _M64
                k += 1
                if (h & mask_l) == 0:
                    cut = k
                    break
        if cut is None:
            cut = end
        cuts.append(cut)
        i = cut
    return cuts


def cdc_chunks(
    df: DataFrame,
    data_col: str = "payload",
    id_col: str = "doc_id",
    min_size: int = 256,
    avg_size: int = 1024,
    max_size: int = 4096,
) -> DataFrame:
    """Chunk a binary column: one output row per chunk —
    (id, chunk_ix, offset, length, digest sha256-hex). Empty/null
    payloads produce no rows (nothing to dedup; the id set is
    recoverable from the input, unlike tokenization this is not a
    row-preserving transform and says so).

    One Arrow pass, no shuffle; chunk rows are emitted per input
    batch so executor memory holds one batch of payloads + its chunk
    table at a time."""

    def part(batches):
        for pdf in batches:
            ids, ixs, offs, lens, digs = [], [], [], [], []
            for rid, data in zip(pdf[id_col], pdf[data_col]):
                if data is None or len(data) == 0:
                    continue
                data = bytes(data)
                prev = 0
                for ix, cut in enumerate(
                    cdc_boundaries(data, min_size, avg_size, max_size)
                ):
                    ids.append(rid)
                    ixs.append(ix)
                    offs.append(prev)
                    lens.append(cut - prev)
                    digs.append(hashlib.sha256(data[prev:cut]).hexdigest())
                    prev = cut
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "chunk_ix": ixs,
                    "offset": offs,
                    "length": lens,
                    "digest": digs,
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_type}, chunk_ix int, offset long, length long,"
        " digest string"
    )
    return df.select(id_col, data_col).mapInPandas(part, schema)


def cdc_dedup_stats(chunks: DataFrame) -> DataFrame:
    """One-row dedup report over a cdc_chunks table: total vs
    distinct chunks and bytes, and the dedup ratio (stored/logical).
    One map-side-combined agg over (digest, length) — the distinct
    side counts unique digests, so a 10^12-chunk archive reduces to
    its distinct-chunk cardinality before the final reduce."""
    per = chunks.groupBy("digest").agg(
        F.count("*").alias("n"), F.first("length").alias("length")
    )
    return per.agg(
        F.sum("n").cast("long").alias("total_chunks"),
        F.count("*").cast("long").alias("distinct_chunks"),
        F.sum(F.col("n") * F.col("length")).cast("long").alias("logical_bytes"),
        F.sum("length").cast("long").alias("stored_bytes"),
        F.round(
            F.sum("length") / F.sum(F.col("n") * F.col("length")).cast("double"),
            6,
        ).alias("dedup_ratio"),
    )
