"""Mergeable streaming sketches: count-min and HyperLogLog.

A 10^10-URL frontier needs corpus-level statistics (hot tokens, hot
hosts, distinct-URL cardinality) that are too big to compute exactly
per monitoring tick. Sketches answer them in CONSTANT memory: a
count-min sketch is a depth x width counter grid, a HyperLogLog is m
one-byte registers — both built with one map-side-combinable agg,
both mergeable across partitions/epochs by elementwise sum/max, so a
running crawl can fold each epoch's sketch into a lifetime sketch
without ever re-scanning history.

Unlike Spark's built-in approx_count_distinct (HLL++ with opaque
per-JVM hashing), these are built from the repo's engine-portable
md5 hash idiom: every counter and register value is a deterministic
pure function of the input set, reproducible bit-for-bit in any
engine (the DuckDB oracles replay them exactly).

Public algorithms: count-min (Cormode & Muthukrishnan 2005),
HyperLogLog (Flajolet et al. 2007). No reference counterpart —
warctools has no sketching; cited for the formulas only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash60(col: Column, seed: str) -> Column:
    """First 60 bits of md5(seed:value) as a non-negative long —
    the repo-standard engine-portable hash (DuckDB replica:
    CAST(('0x' || substr(md5(...), 1, 15)) AS BIGINT))."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + ":"), col.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")


def cms_counters(
    docs: DataFrame,
    width: int = 1024,
    depth: int = 4,
    seed: str = "cms-v1",
    text_col: str = "text",
) -> DataFrame:
    """The count-min counter grid for a corpus (or ONE epoch of one):
    (j, bucket, cnt), at most depth*width rows. This is the sketch's
    mergeable state — persist it per epoch, fold epochs with
    cms_merge(), answer point queries with cms_lookup()."""
    freq = _token_freq(docs, text_col)
    return _cms_hashed(freq, width, depth, seed).groupBy("j", "bucket").agg(
        F.sum("n_exact").cast("long").alias("cnt")
    )


def cms_merge(*grids: DataFrame) -> DataFrame:
    """Fold counter grids (e.g. one per crawl epoch) into one:
    elementwise sum. Exactly equals the grid built from the unioned
    corpora — CMS is linear in the input counts."""
    it = iter(grids)
    out = next(it)
    for g in it:
        out = out.unionByName(g)
    return out.groupBy("j", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cms_lookup(
    counters: DataFrame,
    tokens: DataFrame,
    width: int = 1024,
    depth: int = 4,
    seed: str = "cms-v1",
    token_col: str = "token",
) -> DataFrame:
    """Point-query the sketch: estimated corpus count for each probe
    token — min over the depth rows of its counters. The grid
    broadcasts (constant size); the probe side is never shuffled."""
    hashed = tokens.select(
        F.col(token_col).alias("token"),
        F.posexplode(
            F.array(
                *[
                    (_hash60(F.concat(F.lit(f"{j}:"), F.col(token_col)), seed)
                     % F.lit(width))
                    for j in range(depth)
                ]
            )
        ).alias("j", "bucket"),
    )
    return (
        hashed.join(F.broadcast(counters), ["j", "bucket"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("n_cms"))
    )


def _token_freq(docs: DataFrame, text_col: str) -> DataFrame:
    toks = docs.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token")
    ).where(F.col("token") != "")
    return toks.groupBy("token").agg(
        F.count("*").cast("long").alias("n_exact")
    )


def _cms_hashed(
    freq: DataFrame, width: int, depth: int, seed: str
) -> DataFrame:
    return freq.select(
        "token",
        "n_exact",
        F.posexplode(
            F.array(
                *[
                    (_hash60(F.concat(F.lit(f"{j}:"), F.col("token")), seed)
                     % F.lit(width))
                    for j in range(depth)
                ]
            )
        ).alias("j", "bucket"),
    )


def cms_top_tokens(
    docs: DataFrame,
    width: int = 1024,
    depth: int = 4,
    k: int = 20,
    seed: str = "cms-v1",
    text_col: str = "text",
) -> DataFrame:
    """Count-min-sketch heavy hitters: estimate every token's corpus
    count from a depth x width counter grid — est(t) = min over rows
    j of counter[j][h_j(t)] — and return the top-k by estimate, with
    the exact count alongside as the overestimate audit (CMS error is
    one-sided: n_cms >= n_exact always, overshoot <= corpus_tokens *
    e/width with prob 1 - e^-depth).

    Output: (token, n_exact, n_cms), ordered by (n_cms desc, token).

    Scale: the token stream is pre-aggregated to the vocabulary table
    FIRST (one map-side-combined hash agg — identical counters to
    hashing the raw stream, at vocab not corpus fan-out), then the
    x depth explode and the (j, bucket) agg touch only vocab-sized
    input. The counter grid is depth*width rows REGARDLESS of corpus
    size — it broadcasts, and a per-epoch grid merges into a lifetime
    grid by elementwise sum."""
    freq = _token_freq(docs, text_col)
    hashed = _cms_hashed(freq, width, depth, seed)
    counters = hashed.groupBy("j", "bucket").agg(
        F.sum("n_exact").cast("long").alias("cnt")
    )
    est = (
        hashed.join(F.broadcast(counters), ["j", "bucket"])
        .groupBy("token")
        .agg(
            F.first("n_exact").alias("n_exact"),
            F.min("cnt").cast("long").alias("n_cms"),
        )
    )
    return est.orderBy(F.col("n_cms").desc(), F.col("token").asc()).limit(k)


def hll_distinct(
    df: DataFrame,
    value_col: str,
    m: int = 256,
    seed: str = "hll-v1",
) -> DataFrame:
    """Deterministic HyperLogLog distinct-count estimate, with the
    exact count alongside as the error audit. Standard HLL over a
    60-bit hash: low log2(m) bits pick the register, the remaining
    52 bits' leading-zero rank rho updates it (M_j = max rho), and
    the estimate is alpha_m * m^2 / sum_j 2^-M_j with the
    small-range linear-counting correction (E <= 2.5m and empty
    registers present -> m * ln(m / V)).

    Output: one row (n_exact, n_hll, rel_err).

    Scale: ONE map-side-combinable agg — groupBy(register).min(rest)
    — is the whole corpus-sized stage (max-rho over a register equals
    53 - bitlen(min rest), bitlen being monotone, so min() suffices
    and partial aggs combine). Everything after runs on m rows: the
    bitlen join against a 53-row powers table, the 2^-M fold, the
    correction. The m-row register table is the mergeable state —
    elementwise max folds epochs together. n_exact is computed for
    the audit only; a production tick reads just the register table.

    m=256 -> ~1.04/sqrt(256) = 6.5% standard error in ~256 bytes."""
    reg = hll_registers(df, value_col, m, seed)
    exact = df.agg(F.countDistinct(value_col).cast("long").alias("n_exact"))
    return (
        _hll_stats(reg, m)
        .crossJoin(F.broadcast(exact))
        .select(
            "n_exact",
            F.round(F.col("__est"), 4).alias("n_hll"),
            F.round(
                F.abs(F.col("__est") - F.col("n_exact")) / F.col("n_exact"), 4
            ).alias("rel_err"),
        )
    )


def hll_registers(
    df: DataFrame,
    value_col: str,
    m: int = 256,
    seed: str = "hll-v1",
) -> DataFrame:
    """The HLL register table for a value set (or ONE epoch of one):
    (idx, minv), at most m rows — the sketch's mergeable state.
    minv is the MIN of the post-index hash bits per register, which
    carries the max leading-zero rank (bitlen is monotone); persist
    it per epoch and fold epochs with hll_merge(). One map-side-
    combinable min() agg is the only corpus-sized stage."""
    if m & (m - 1):
        raise ValueError("m must be a power of two")
    p = m.bit_length() - 1
    h = _hash60(F.col(value_col), seed)
    # idx from the low p bits, v from the high bits — bit ops, never
    # float division (a 60-bit value does not fit a double mantissa)
    return (
        df.select(
            h.bitwiseAND(F.lit(m - 1)).alias("idx"),
            F.shiftright(h, p).alias("v"),
        )
        .groupBy("idx")
        .agg(F.min("v").alias("minv"))
    )


def hll_merge(*regs: DataFrame) -> DataFrame:
    """Fold register tables (e.g. one per crawl epoch) into one:
    elementwise min(minv) = elementwise max rank. Exactly equals the
    registers built from the unioned value sets — HLL state depends
    only on the set of hashes seen."""
    it = iter(regs)
    out = next(it)
    for r in it:
        out = out.unionByName(r)
    return out.groupBy("idx").agg(F.min("minv").alias("minv"))


def hll_estimate(regs: DataFrame, m: int = 256) -> DataFrame:
    """Distinct-count estimate from a register table alone — the
    production monitoring path: no rescan of the corpus, just the
    <= m-row state. Output: one row (n_hll)."""
    return _hll_stats(regs, m).select(F.round(F.col("__est"), 4).alias("n_hll"))


def _hll_stats(reg: DataFrame, m: int) -> DataFrame:
    """(idx, minv) registers -> one row with the corrected HLL
    estimate in __est (plus Z and V for inspection)."""
    if m & (m - 1):
        raise ValueError("m must be a power of two")
    spark = reg.sparkSession
    p = m.bit_length() - 1
    bits = 60 - p  # hash bits left after the register index
    powers = spark.range(bits).select(
        F.col("id").alias("k"), F.pow(F.lit(2.0), F.col("id")).cast("long").alias("p2")
    )
    bitlen = (
        reg.join(F.broadcast(powers), F.col("p2") <= F.col("minv"), "left")
        .groupBy("idx", "minv")
        .agg(F.max("k").alias("maxk"))
        .select(
            "idx",
            # v = 0 (all hash bits zero) -> rho = bits + 1; else 53-bitlen
            F.when(F.col("minv") == 0, F.lit(bits + 1))
            .otherwise(F.lit(bits + 1) - (F.col("maxk") + 1))
            .cast("long")
            .alias("M"),
        )
    )
    dom = spark.range(m).select(F.col("id").alias("idx"))
    regs = dom.join(bitlen, "idx", "left").select(
        "idx", F.coalesce(F.col("M"), F.lit(0)).alias("M")
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    stats = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("M"))).alias("Z"),
        F.sum(F.when(F.col("M") == 0, 1).otherwise(0)).cast("long").alias("V"),
    )
    est_raw = F.lit(alpha * m * m) / F.col("Z")
    est = F.when(
        (est_raw <= 2.5 * m) & (F.col("V") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("V")),
    ).otherwise(est_raw)
    return stats.select("Z", "V", est.alias("__est"))
