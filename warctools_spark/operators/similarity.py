"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k: exact baseline, one pass over the table,
  JVM-side zip_with/aggregate arithmetic, top-k via orderBy+limit
  (Spark's TakeOrderedAndProject — no full sort materialization).
* IVF-style bucketed ANN: coarse quantization by sign-pattern cells
  (deterministic, data-independent); queries probe only their own cell
  and its neighbors, cutting the scan by ~2^bucket_dims at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_to_query(
    emb: DataFrame, query_vec: list[float], vec_col: str = "embedding"
) -> DataFrame:
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    qn = sum(v * v for v in query_vec) ** 0.5
    return emb.withColumn(
        "cosine",
        _dot(F.col(vec_col).cast("array<double>"), q) / (F.lit(qn) * _norm(F.col(vec_col).cast("array<double>"))),
    )


def brute_force_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k with a deterministic id tiebreak."""
    return (
        cosine_to_query(emb, query_vec, vec_col)
        .select(F.col(id_col), F.round(F.col("cosine"), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def sign_cell(vec: Column, dims: int) -> Column:
    """Coarse IVF cell: sign pattern of the first `dims` components."""
    return F.concat_ws(
        "",
        *[F.when(vec[i] >= 0, F.lit("1")).otherwise(F.lit("0")) for i in range(dims)],
    )


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 4,
    probe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k: scan only cells within `probe_hamming` sign flips of
    the query's cell. Recall is tested against brute force; at scale
    the scan cost drops by ~2^dims / (#probed cells)."""
    qcell = "".join("1" if v >= 0 else "0" for v in query_vec[:dims])
    cells = {qcell}
    if probe_hamming >= 1:
        for i in range(dims):
            flipped = list(qcell)
            flipped[i] = "0" if flipped[i] == "1" else "1"
            cells.add("".join(flipped))
    celled = emb.withColumn("cell", sign_cell(F.col(vec_col), dims)).where(
        F.col("cell").isin(list(cells))
    )
    return brute_force_topk(celled, query_vec, k, id_col, vec_col)


def lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 4,
    bits_per_band: int = 8,
    dims: int | None = None,
) -> DataFrame:
    """ANN top-k via banded hyperplane LSH probe + exact rerank — the
    scale path beyond the sign-cell IVF: candidates are rows sharing
    the query's band key in ANY band (expected corpus fraction
    ~bands/2^bits), reranked by exact cosine.

    Plan shape: the probe is a literal isin() filter on precomputed
    band keys — pushdown-able to the scan, and partition-pruning if
    the corpus is stored bucketed by (band, band_key); the rerank is
    TakeOrderedAndProject over the small candidate set. Shares the
    deterministic md5-parity hyperplanes with the dedup family
    (dedup._hyperplane), so one stored key table serves both."""
    from warctools_spark.operators.dedup import (
        _hyperplane,
        _resolve_dims,
        hyperplane_band_keys,
    )

    # dims must match BOTH sides: a mismatch makes the corpus-side
    # zip_with null out (all-zeros keys) while the driver-side query
    # keys stay real — candidates go near-empty with no error
    dims = _resolve_dims(emb, vec_col, dims)
    if len(query_vec) != dims:
        raise ValueError(
            f"query_vec has {len(query_vec)} dims but corpus embeddings "
            f"have {dims}"
        )

    # query-side keys computed driver-side with the same hyperplanes
    probe_keys = []
    for b in range(bands):
        bits = []
        for j in range(bits_per_band):
            h = _hyperplane(b, j, dims)
            dot = sum(x * y for x, y in zip(query_vec, h))
            bits.append("1" if dot >= 0 else "0")
        probe_keys.append(f"{b}:{''.join(bits)}")

    keyed = emb.withColumn(
        "__v", F.col(vec_col).cast("array<double>")
    ).withColumn(
        "__bk",
        F.transform(
            hyperplane_band_keys("__v", bands, bits_per_band, dims),
            lambda s: F.concat(
                s["band"].cast("string"), F.lit(":"), s["band_key"]
            ),
        ),
    )
    cands = keyed.where(
        F.arrays_overlap(
            "__bk", F.array(*[F.lit(p) for p in probe_keys])
        )
    ).drop("__bk", "__v")
    return brute_force_topk(cands, query_vec, k, id_col, vec_col)
