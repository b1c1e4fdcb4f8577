"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k: exact baseline, one pass over the table,
  JVM-side zip_with/aggregate arithmetic, top-k via orderBy+limit
  (Spark's TakeOrderedAndProject — no full sort materialization).
* IVF-style bucketed ANN: coarse quantization by sign-pattern cells
  (deterministic, data-independent); queries probe only their own cell
  and its neighbors, cutting the scan by ~2^bucket_dims at scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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
        _require_dims,
        _resolve_dims,
        hyperplane_band_keys,
    )

    # dims must match BOTH sides: a mismatch makes the corpus-side
    # zip_with null out (all-zeros keys) while the driver-side query
    # keys stay real — candidates go near-empty with no error
    dims = _resolve_dims(emb, vec_col, dims)
    emb = _require_dims(emb, vec_col, dims)
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


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    """Squared euclidean distance to a literal centroid, summed as a
    left fold in index order — the same fold order DuckDB's list
    functions use, so oracle values match bit-for-bit pre-rounding."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_centroids: int = 6,
    assign_mode: str = "auto",
) -> DataFrame:
    """Deterministic Lloyd k-means over an embedding column — the
    clustering stage of SemDeDup-style semantic dedup (cluster first,
    then run exact near-dup only within clusters) and of IVF index
    training.

    Determinism: centroids initialize to the vectors of the k lowest
    ids (no RNG); assignment argmin breaks ties on cluster id; updated
    centroids round to `round_centroids` decimals so the ~1e-13
    summation-order noise of a distributed avg cannot flip later
    assignments between runs or engines.

    Scale shape: assignment has two interchangeable physical modes —
    "expr": a JVM-only expression over a literal centroid array (no
    join, no shuffle, and the exact left-fold arithmetic the DuckDB
    oracle replays bit-for-bit); "pandas": one Arrow-batched numpy
    GEMM per batch (||x-c||² = ||x||² - 2x·Cᵀ + ||c||²), which beats
    the k×dims-literal codegen once centroids get large but sums in
    pairwise (not left-fold) order, so argmin can differ from "expr"
    only on sub-ulp distance ties. "auto" (default) picks expr below
    k*dims=1024 (the oracle-parity regime) and pandas above. The
    update is one posexplode + (cluster, dim) hash agg with map-side
    combine, and only k x dims averaged values return to the driver
    per iteration (the same O(small) driver traffic as Lloyd on any
    cluster). Returns (id, cluster, dist) with dist rounded to 6.
    """
    assigned, _ = _lloyd(
        emb, k, iterations, id_col, vec_col, round_centroids, assign_mode
    )
    return assigned.select(
        id_col,
        "cluster",
        F.round(F.sqrt(F.col("__d2")), 6).alias("dist"),
    )


def _assign_to_centroids(
    df: DataFrame, centroids: dict, assign_mode: str
) -> DataFrame:
    """Assign rows (with a `__v` array<double> column) to the nearest
    of a literal centroid dict — the single assignment implementation
    shared by the Lloyd loop, the per-call IVF query path, and
    ivf_index_append, so their cluster semantics cannot drift apart.
    Returns df + (cluster, __d2)."""
    from pyspark.sql.functions import pandas_udf

    if assign_mode not in ("expr", "pandas"):
        raise ValueError(f"unknown assign_mode: {assign_mode!r}")
    if assign_mode == "expr":
        cells = F.array(
            *[
                F.struct(
                    _sq_dist(F.col("__v"), c).alias("d2"),
                    F.lit(cid).alias("cluster"),
                )
                for cid, c in sorted(centroids.items())
            ]
        )
        best = F.array_min(cells)
        return df.withColumn("cluster", best["cluster"]).withColumn(
            "__d2", best["d2"]
        )
    cids = np.array(sorted(centroids))
    cmat = np.array([centroids[c] for c in sorted(centroids)])
    cnorm = (cmat * cmat).sum(axis=1)

    @pandas_udf("struct<cluster:int,d2:double>")
    def _assign(vs: pd.Series) -> pd.DataFrame:
        x = np.array(vs.tolist(), dtype=np.float64)
        if x.size == 0:
            return pd.DataFrame({"cluster": [], "d2": []})
        d2 = (
            (x * x).sum(axis=1)[:, None]
            - 2.0 * (x @ cmat.T)
            + cnorm[None, :]
        )
        best = d2.argmin(axis=1)  # first index wins = lowest cid
        return pd.DataFrame(
            {
                "cluster": cids[best].astype("int32"),
                # clamp: the expanded form can go slightly negative
                "d2": np.maximum(d2[np.arange(len(best)), best], 0.0),
            }
        )

    a = _assign(F.col("__v"))
    return df.withColumn("cluster", a["cluster"]).withColumn(
        "__d2", a["d2"]
    )


def _lloyd(
    emb: DataFrame,
    k: int,
    iterations: int,
    id_col: str,
    vec_col: str,
    round_centroids: int,
    assign_mode: str,
) -> tuple[DataFrame, dict]:
    """Shared Lloyd loop behind kmeans_assign and ivf_kmeans_topk:
    returns (assigned(id, __v, cluster, __d2), final centroids)."""
    from warctools_spark.operators.dedup import _require_dims

    # dims derives from the init collect (which Lloyd needs anyway)
    # instead of a dedicated min/max-size aggregate over the whole
    # table — one full input pass fewer per call (r6). Ragged vectors
    # beyond the sampled init rows still FAIL the job via the
    # executor-side _require_dims guard on every later pass.
    init_rows = (
        emb.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
        )
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    if not init_rows:
        raise ValueError(
            "cannot initialize k-means: input has no vectors"
        )
    if any(r["__v"] is None for r in init_rows):
        raise ValueError(
            "null embedding among the k lowest-id init vectors; drop "
            "null vectors before clustering"
        )
    dims = len(init_rows[0]["__v"])
    if any(len(r["__v"]) != dims for r in init_rows):
        raise ValueError(
            f"ragged embedding column {vec_col!r} among the k lowest-id "
            "init vectors; filter to one dimensionality first"
        )
    keyed = _require_dims(emb, vec_col, dims).select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    centroids = {i: list(r["__v"]) for i, r in enumerate(init_rows)}
    if assign_mode == "auto":
        assign_mode = "pandas" if k * dims >= 1024 else "expr"
    if assign_mode not in ("expr", "pandas"):
        raise ValueError(f"unknown assign_mode: {assign_mode!r}")

    def assign(df):
        return _assign_to_centroids(df, centroids, assign_mode)

    assigned = assign(keyed)
    for _ in range(max(iterations - 1, 0)):
        upd = (
            assigned.select("cluster", F.posexplode("__v").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.round(F.avg("val"), round_centroids).alias("val"))
            .collect()
        )
        new_c: dict = {}
        for r in upd:
            new_c.setdefault(int(r["cluster"]), [0.0] * dims)[int(r["dim"])] = (
                float(r["val"])
            )
        # empty clusters keep their previous centroid
        centroids = {cid: new_c.get(cid, c) for cid, c in centroids.items()}
        assigned = assign(keyed)
    return assigned, centroids


def ivf_kmeans_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 8,
    iterations: int = 2,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k over a kmeans-trained IVF index (the classic
    inverted-file ANN: Lloyd centroids as the coarse quantizer instead
    of the data-independent sign cells of ivf_topk). Train `n_cells`
    deterministic Lloyd centroids, pick the `n_probe` cells whose
    centroids are nearest the query (driver-side — n_cells distances),
    and exact-rerank only the vectors assigned to those cells.

    Scale shape: training is the kmeans_assign plan (map-side combined
    centroid update, k*dims rows to the driver per iteration); the
    probe is a literal IN filter on the cluster column — if the corpus
    is stored partitioned by cluster (the IVF layout), that prunes
    ~(1 - n_probe/n_cells) of the scan before it starts; the rerank is
    TakeOrderedAndProject over the probed fraction. Expected recall
    rises with n_probe; exact when n_probe = n_cells. In production
    the trained index (cluster column + centroid table) is written
    once and reused across queries — this entry trains per call only
    so the whole path stays one oracle-checkable expression."""
    assigned, centroids = _lloyd(
        emb, n_cells, iterations, id_col, vec_col, 6, "expr"
    )
    probe = _select_probe_cells(centroids, query_vec, n_probe)
    cands = assigned.where(F.col("cluster").isin(probe))
    return brute_force_topk(cands, query_vec, k, id_col, vec_col="__v")


def _select_probe_cells(
    centroids: dict, query_vec: list[float], n_probe: int
) -> list[int]:
    """The n_probe cluster ids nearest the query — driver-side
    left-fold float64 arithmetic (the same order as the SQL oracle's
    list_sum fold), ties broken on cluster id. Shared by the
    train-per-call and persisted-index query paths so their probe
    selection cannot drift apart."""
    if not centroids:
        raise ValueError("empty centroid set: no vectors to index")
    dims = len(next(iter(centroids.values())))
    if len(query_vec) != dims:
        raise ValueError(
            f"query_vec has {len(query_vec)} dims but centroids have "
            f"{dims}"
        )
    ranked = sorted(
        (
            sum((x - y) * (x - y) for x, y in zip(query_vec, c)),
            cid,
        )
        for cid, c in centroids.items()
    )
    return [cid for _, cid in ranked[:n_probe]]


def semdedup_survivors(
    emb: DataFrame,
    k: int = 8,
    iterations: int = 2,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023 pattern, public): cluster the
    embeddings, then drop any vector whose cluster contains a
    LOWER-id vector with cosine >= threshold. Returns survivors
    (id, cluster).

    This is the scale story for semantic dedup: the O(n²) cosine
    comparison is confined within k-means cells, so the self-join
    shuffles on the cluster key and each task does at most
    (n/k)² work — k is the knob that bounds per-task cost. Keeper
    choice (lowest id) is deterministic; the cosine is rounded to 6
    before thresholding so engine fp noise cannot flip membership."""
    assigned = kmeans_assign(emb, k, iterations, id_col, vec_col).select(
        F.col(id_col), "cluster"
    )
    keyed = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    ).join(assigned, id_col)
    a = keyed.select(
        F.col(id_col).alias("id_a"), "cluster", F.col("__v").alias("__va")
    )
    b = keyed.select(
        F.col(id_col).alias("id_b"), "cluster", F.col("__v").alias("__vb")
    )
    cos = _dot(F.col("__va"), F.col("__vb")) / (
        _norm(F.col("__va")) * _norm(F.col("__vb"))
    )
    dropped = (
        a.join(b, "cluster")
        .where(F.col("id_b") < F.col("id_a"))
        .where(F.round(cos, 6) >= threshold)
        .select(F.col("id_a").alias(id_col))
        .distinct()
    )
    return keyed.join(dropped, id_col, "left_anti").select(
        F.col(id_col), "cluster"
    )


def build_ivf_index(
    emb: DataFrame,
    path: str,
    n_cells: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Materialize the IVF index ivf_kmeans_topk trains per call:
    vectors written partitioned by their Lloyd cluster id (the
    inverted-file layout) plus a centroids sidecar. Train once, query
    many — each query then reads only its probed cells' partitions
    (see ivf_index_topk, partition pruning plan-asserted in tests).
    Returns the centroid dict {cluster: [floats]}.

    Sidecar + vectors I/O goes through the Hadoop FileSystem resolved
    from `path` (plans/fs.py), so path="s3a://bucket/index" is the
    same code path as the local stand-in."""
    import json

    from warctools_spark.plans.fs import HadoopFS

    assigned, centroids = _lloyd(
        emb, n_cells, iterations, id_col, vec_col, 6, "expr"
    )
    # checkpoint before the two consumers below: otherwise the parquet
    # write materializes the full Lloyd lineage once and the baseline
    # aggregate re-runs it from scratch (ivf_index_append already does
    # this for the same reason)
    assigned = assigned.localCheckpoint(eager=True)
    (
        assigned.select(id_col, "cluster", F.col("__v").alias("embedding"))
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(path.rstrip("/") + "/vectors")
    )
    # baseline quantization quality for the append-path drift metric
    base = assigned.agg(
        F.avg(F.sqrt(F.col("__d2"))).alias("mean_dist")
    ).collect()[0]
    sidecar = {
        "n_cells": n_cells,
        "centroids": {str(c): v for c, v in centroids.items()},
        "mean_dist": float(base["mean_dist"]),
    }
    fs = HadoopFS(emb.sparkSession, path)
    fs.write_text_atomic(
        path.rstrip("/") + "/centroids.json", json.dumps(sidecar)
    )
    return centroids


def ivf_index_append(
    emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_mode: str = "auto",
) -> dict:
    """Incremental IVF maintenance: assign NEW vectors to the
    EXISTING centroids (no retrain — one map-side assignment pass,
    zero shuffles) and append them to their cells' partitions. The
    crawl keeps producing embeddings; this is the path that absorbs
    them without re-reading the indexed corpus.

    Returns a drift report: {"n_appended", "mean_dist" (of the
    appended batch to its assigned centroids), "baseline_mean_dist"
    (recorded in the sidecar at build time), "drift_ratio"}. A
    drift_ratio well above 1 means the new data no longer matches the
    trained quantizer — the retrain trigger: rebuild with
    build_ivf_index over the union (queries keep working unchanged
    meanwhile, just with degraded cell balance)."""
    import json

    from warctools_spark.operators.dedup import _require_dims
    from warctools_spark.plans.fs import HadoopFS

    fs = HadoopFS(emb.sparkSession, path)
    sidecar = json.loads(fs.read_text(path.rstrip("/") + "/centroids.json"))
    centroids = {int(c): v for c, v in sidecar["centroids"].items()}
    dims = len(next(iter(centroids.values())))
    if assign_mode == "auto":
        assign_mode = "pandas" if len(centroids) * dims >= 1024 else "expr"
    keyed = _require_dims(emb, vec_col, dims).select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    assigned = _assign_to_centroids(
        keyed, centroids, assign_mode
    ).localCheckpoint(eager=True)
    (
        assigned.select(id_col, "cluster", F.col("__v").alias("embedding"))
        .write.mode("append")
        .partitionBy("cluster")
        .parquet(path.rstrip("/") + "/vectors")
    )
    stats = assigned.agg(
        F.count("*").alias("n"),
        F.avg(F.sqrt(F.col("__d2"))).alias("mean_dist"),
    ).collect()[0]
    baseline = sidecar.get("mean_dist")
    mean_dist = float(stats["mean_dist"]) if stats["n"] else 0.0
    if baseline is None:
        drift = None  # pre-baseline sidecar: no data, not "no drift"
    elif baseline == 0.0:
        # every base vector coincided with its centroid; ANY appended
        # distance is infinite relative drift, not a missing metric
        drift = 0.0 if mean_dist == 0.0 else float("inf")
    else:
        drift = mean_dist / baseline
    return {
        "n_appended": int(stats["n"]),
        "mean_dist": mean_dist,
        "baseline_mean_dist": baseline,
        "drift_ratio": drift,
    }


def ivf_index_topk(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """Query a persisted IVF index: pick the n_probe cells whose
    centroids are nearest the query (driver-side, from the sidecar —
    no job), then scan ONLY those cells' partitions (`cluster IN`
    reaches the parquet scan as a PartitionFilter) and exact-rerank.
    Identical results to the train-per-call ivf_kmeans_topk at the
    same parameters (tested)."""
    import json

    from warctools_spark.plans.fs import HadoopFS

    fs = HadoopFS(spark, path)
    sidecar = json.loads(fs.read_text(path.rstrip("/") + "/centroids.json"))
    centroids = {int(c): v for c, v in sidecar["centroids"].items()}
    probe = _select_probe_cells(centroids, query_vec, n_probe)
    vectors = spark.read.parquet(path.rstrip("/") + "/vectors")
    cands = vectors.where(F.col("cluster").isin(probe))
    return brute_force_topk(cands, query_vec, k, id_col, vec_col="embedding")
