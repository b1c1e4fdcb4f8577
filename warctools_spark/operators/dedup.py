"""Document deduplication operators for training-data pipelines.

All built from JVM-side expressions where possible; hashing is md5/sha
(stable across engines, so the DuckDB oracle can replay the exact
semantics). Shuffle discipline:

* exact dedup: one hash-agg shuffle on the digest (map-side partial agg
  kicks in automatically);
* MinHash/LSH near-dup: signatures are computed scan-side (no
  shuffle), banding explodes to (band, band_hash) and the only shuffle
  is the groupBy on band buckets — the canonical LSH plan that scales
  linearly in documents rather than quadratically in pairs;
* SimHash: 64-bit fingerprint scan-side; candidate pairing via band
  keys on 16-bit chunks (hamming<=3 within any chunk-equal pair set);
* embedding near-dup: cosine over `array<float>` via built-in
  zip_with/aggregate — JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalized_text(col: Column) -> Column:
    """Lowercase, collapse whitespace — the usual pre-dedup normalize."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups by md5 of normalized text: one row per
    distinct content, keeping the lowest id (deterministic canonical)."""
    return (
        docs.select(
            F.md5(normalized_text(F.col(text_col))).alias("content_md5"),
            F.col(id_col),
        )
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("dup_count"),
        )
    )


def exact_dedup_keep_first(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The documents that survive exact dedup (lowest id per content)."""
    canon = exact_dedup(docs, text_col, id_col).select(
        F.col("canonical_id").alias(id_col)
    )
    return docs.join(canon, on=id_col, how="inner")


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct) from normalized text —
    pure JVM: split + transform over slice windows."""
    words = F.split(normalized_text(col), " ")
    k = F.size(words) - (n - 1)
    return F.array_distinct(
        F.when(
            k > 0,
            F.transform(
                F.sequence(F.lit(0), k - 1),
                lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", words)))
    )


# Mersenne prime modulus for the affine hash family; coefficients are
# fixed (deterministic across runs + engines). a*h stays < 2^51 so the
# arithmetic is exact in int64 on both Spark and DuckDB.
_MH_P = 2147483647  # 2^31 - 1
_MH_A = [1000003 + 37 * i for i in range(64)]
_MH_B = [777767777 + 101 * i for i in range(64)]


def shingle_hashes(col: Column, n: int = 3) -> Column:
    """One md5 per shingle -> bigint (mod 2^31-1). The expensive hash
    happens once; the MinHash family is cheap affine mixes of it."""
    return F.transform(
        shingles(col, n),
        lambda s: F.pmod(
            F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint"),
            F.lit(_MH_P),
        ),
    )


def minhash_signature(col: Column, num_hashes: int = 16, n: int = 3) -> Column:
    """MinHash signature: array of num_hashes minima over the shingle
    set under the affine family h_i(x) = (a_i*x + b_i) mod (2^31-1).
    Scan-side only — no shuffle; one md5 pass per shingle."""
    hs = shingle_hashes(col, n)

    def _mix(i):
        return lambda h: (h * _MH_A[i] + _MH_B[i]) % _MH_P

    return F.array(
        *[F.array_min(F.transform(hs, _mix(i))) for i in range(num_hashes)]
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    parallelism: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    rows = (band, band_key, id_a, id_b) distinct pairs that collide in
    at least one band. Only the band groupBy shuffles.
    """
    rows_per_band = num_hashes // bands
    # small-file inputs arrive as one partition; the signature pass is
    # CPU-bound, so spread it before computing (cheap: raw text only)
    p = parallelism or docs.sparkSession.sparkContext.defaultParallelism
    docs = docs.repartition(p)
    # two-step projection: shingle hashes materialize once (Catalyst's
    # CollapseProject does not inline non-cheap exprs referenced many
    # times, so the md5 pass is not duplicated 16x)
    hs = docs.select(F.col(id_col), shingle_hashes(F.col(text_col)).alias("hs"))

    def _mix(i):
        return lambda h: (h * _MH_A[i] + _MH_B[i]) % _MH_P

    sig = hs.select(
        id_col,
        F.array(
            *[F.array_min(F.transform("hs", _mix(i))) for i in range(num_hashes)]
        ).alias("sig"),
    )
    banded = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "-",
                            *[
                                F.col("sig")[b * rows_per_band + r].cast("string")
                                for r in range(rows_per_band)
                            ],
                        ).alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
    # bucket-collect instead of self-join: a self-join would execute the
    # signature pipeline twice; one groupBy + in-bucket pair explosion
    # scans once and shuffles once
    buckets = (
        banded.groupBy("band", "band_key")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    pair_gen = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size("ids")),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_gen).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
    )


def ngram_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs (the LSH
    verify stage): pairs(id_a, id_b) -> + jaccard double."""
    sh = docs.select(F.col(id_col), shingles(F.col(text_col), n).alias("sh"))
    out = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "inter", F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
        )
        .withColumn("uni", F.size(F.array_union(F.col("sh_a"), F.col("sh_b"))))
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / F.col("uni")).alias("jaccard"),
        )
    )
    return out


def simhash60(col: Column, n: int = 3) -> Column:
    """60-bit SimHash over word n-gram shingles — all JVM expressions.

    bit_j = 1 iff sum over shingles of (bit_j(h(s)) ? +1 : -1) > 0,
    h(s) = first 15 hex chars of md5 (60 bits; md5 is used so the
    DuckDB oracle reproduces the value exactly).

    Shingle hashes are materialized once into an array; the 60 per-bit
    majority votes then fold over bigints, not over repeated md5 calls.
    """
    hashes = F.transform(
        shingles(col, n),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint"),
    )
    def _vote(j):
        # NB: a default-arg lambda (acc, h, j=j) breaks pyspark's
        # higher-order-function arity inspection; close over j instead
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bits = []
    for j in range(60):
        votes = F.aggregate(hashes, F.lit(0), _vote(j))
        bits.append(
            F.when(votes > 0, F.lit(2**j).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def embedding_cosine_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_dims: int = 4,
) -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold.

    Scale path: sign-LSH bucketing on the first `bucket_dims`
    dimensions' signs restricts the self-join to same-bucket pairs
    (near-identical vectors share sign patterns with high
    probability); exactness for the test corpus is preserved by
    comparing against the brute-force path in tests.
    """
    sign_key = F.concat_ws(
        "",
        *[
            F.when(F.col(vec_col)[i] >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(bucket_dims)
        ],
    )
    keyed = emb.select(F.col(id_col), F.col(vec_col), sign_key.alias("bucket"))
    a, b = keyed.alias("a"), keyed.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda side: F.sqrt(  # noqa: E731
        F.aggregate(
            F.col(f"{side}.{vec_col}"), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    return (
        a.join(
            b,
            on=[
                F.col("a.bucket") == F.col("b.bucket"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .withColumn("cosine", dot / (norm("a") * norm("b")))
        .where(F.col("cosine") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "cosine",
        )
    )
