"""FastCDC content-defined chunking: kernel properties (the defining
shift-resilience one included), Spark operator contract, dedup stats.
Not SQL-expressible (binary rolling hash) — the bpe_train/WAV-codec
evidence class."""

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from warctools_spark.operators.cdc import (
    cdc_boundaries,
    cdc_chunks,
    cdc_dedup_stats,
)


def _payload(n, seed=7):
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(n))


def test_boundaries_reconstruct_and_bound_sizes():
    data = _payload(50_000)
    cuts = cdc_boundaries(data, 256, 1024, 4096)
    assert cuts[-1] == len(data)
    assert cuts == sorted(set(cuts))
    prev = 0
    for c in cuts[:-1]:
        assert 256 < c - prev <= 4096  # min exclusive (cut AFTER min+1 bytes)
        prev = c
    assert 0 < cuts[-1] - (cuts[-2] if len(cuts) > 1 else 0) <= 4096
    # deterministic
    assert cuts == cdc_boundaries(data, 256, 1024, 4096)
    # average lands in the right ballpark (within 3x either side)
    mean = len(data) / len(cuts)
    assert 1024 / 3 < mean < 1024 * 3


def test_boundaries_edge_cases():
    assert cdc_boundaries(b"") == []
    assert cdc_boundaries(b"x") == [1]
    tiny = _payload(100)
    assert cdc_boundaries(tiny, 256, 1024, 4096) == [100]
    # constant data never hits a mask -> max_size slabs
    flat = bytes(20_000)
    cuts = cdc_boundaries(flat, 256, 1024, 4096)
    assert cuts[:-1] == [4096 * i for i in range(1, len(cuts))]
    with pytest.raises(ValueError):
        cdc_boundaries(b"abc", 100, 50, 200)


def test_shift_resilience_the_point_of_cdc():
    data = _payload(40_000, seed=11)
    shifted = _payload(333, seed=12) + data

    def digests(d):
        out, prev = [], 0
        for c in cdc_boundaries(d, 256, 1024, 4096):
            out.append(hashlib.sha256(d[prev:c]).hexdigest())
            prev = c
        return out

    a, b = digests(data), digests(shifted)
    # all but a bounded prefix of chunks survive the insertion
    k = 0
    while k < min(len(a), len(b)) and a[-1 - k] == b[-1 - k]:
        k += 1
    assert k >= len(a) - 3  # at most ~3 head chunks disturbed
    # fixed-size chunking fails this exact test
    fixed_a = [
        hashlib.sha256(data[i : i + 1024]).hexdigest()
        for i in range(0, len(data), 1024)
    ]
    fixed_b = [
        hashlib.sha256(shifted[i : i + 1024]).hexdigest()
        for i in range(0, len(shifted), 1024)
    ]
    assert not set(fixed_a[:-1]) & set(fixed_b[:-1])


def test_cdc_chunks_operator_contract(spark):
    shared = _payload(9_000, seed=3)
    rows = [
        (0, _payload(6_000, seed=1) + shared),
        (1, shared + _payload(2_000, seed=2)),
        (2, b""),
        (3, None),
        (4, _payload(500, seed=4)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    chunks = cdc_chunks(df).collect()
    by_id = {}
    for r in chunks:
        by_id.setdefault(r.doc_id, []).append(r)
    assert set(by_id) == {0, 1, 4}  # empty/null payloads emit nothing
    for rid, data in [(0, rows[0][1]), (1, rows[1][1]), (4, rows[4][1])]:
        rs = sorted(by_id[rid], key=lambda r: r.chunk_ix)
        assert rs[0].offset == 0
        assert sum(r.length for r in rs) == len(data)
        for r in rs:
            seg = data[r.offset : r.offset + r.length]
            assert hashlib.sha256(seg).hexdigest() == r.digest
    # the shared region dedups across the two docs
    d0 = {r.digest for r in by_id[0]}
    d1 = {r.digest for r in by_id[1]}
    assert d0 & d1
    # partitioning invariance
    again = sorted(map(tuple, cdc_chunks(df.repartition(7)).collect()))
    assert again == sorted(map(tuple, chunks))


def test_cdc_dedup_stats(spark):
    shared = _payload(20_000, seed=5)
    df = spark.createDataFrame(
        [(0, shared), (1, shared)], "doc_id long, payload binary"
    )
    stats = cdc_dedup_stats(cdc_chunks(df)).collect()[0]
    assert stats.total_chunks == 2 * stats.distinct_chunks
    assert stats.logical_bytes == 2 * 20_000
    assert stats.stored_bytes == 20_000
    assert stats.dedup_ratio == 0.5
