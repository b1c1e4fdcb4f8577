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

from warctools_spark.functions.exprs import portable_hash60 as _hash60


def _cms_bucket_array(col: Column, width: int, depth: int, seed: str) -> Column:
    """The depth bucket hashes for one token, posexplode-ready. This
    is the ONE definition both the grid build and point lookups go
    through — they are only correct together because the expression
    is shared (a drift in either side makes every lookup silently
    wrong while the grid itself still oracle-checks)."""
    return F.array(
        *[
            (_hash60(F.concat(F.lit(f"{j}:"), col), seed) % F.lit(width))
            for j in range(depth)
        ]
    )


def _with_params(df: DataFrame, **params) -> DataFrame:
    """Stamp sketch parameters onto the state table as constant
    columns, so consume/merge paths can verify them at execution time
    instead of silently mis-hashing against a grid built with
    different parameters."""
    for k, v in params.items():
        df = df.withColumn(k, F.lit(v))
    return df


def _assert_params(df: DataFrame, what: str, **params) -> DataFrame:
    """Lazily assert every state row carries the expected parameters
    (raises at execution — the states are lazy, so an eager check
    would force a job). Returns the state with param columns dropped.
    Done via .where(assert_true(..).isNull()) — a dropped unused
    column would be pruned by Catalyst and never evaluated."""
    cond = F.lit(True)
    for k, v in params.items():
        cond = cond & (F.col(k) == F.lit(v))
    msg = (
        f"{what}: state was built with different parameters than "
        f"requested {params} — estimates would be silently wrong"
    )
    return df.where(F.assert_true(cond, F.lit(msg)).isNull()).drop(
        *params.keys()
    )


def _assert_uniform_params(df: DataFrame, what: str, cols: list[str]) -> DataFrame:
    """Lazily assert all states being folded share one parameter set
    (mixed-parameter grids would union without colliding and read
    back as plausible garbage)."""
    n = df.select(*cols).distinct().agg(F.count("*").alias("__nparam"))
    msg = f"{what}: cannot fold sketches built with different parameters"
    return (
        df.crossJoin(F.broadcast(n))
        .where(F.assert_true(F.col("__nparam") == 1, F.lit(msg)).isNull())
        .drop("__nparam")
    )


def cms_counters(
    docs: DataFrame,
    width: int = 1024,
    depth: int = 4,
    seed: str = "cms-v1",
    text_col: str = "text",
) -> DataFrame:
    """The count-min counter grid for a corpus (or ONE epoch of one):
    (j, bucket, cnt) + constant (width, depth, seed) parameter stamp,
    at most depth*width rows. This is the sketch's mergeable state —
    persist it per epoch, fold epochs with cms_merge(), answer point
    queries with cms_lookup(); both verify the stamp at execution."""
    freq = _token_freq(docs, text_col)
    grid = _cms_hashed(freq, width, depth, seed).groupBy("j", "bucket").agg(
        F.sum("n_exact").cast("long").alias("cnt")
    )
    return _with_params(grid, width=width, depth=depth, seed=seed)


def cms_merge(*grids: DataFrame) -> DataFrame:
    """Fold counter grids (e.g. one per crawl epoch) into one:
    elementwise sum. Exactly equals the grid built from the unioned
    corpora — CMS is linear in the input counts. Raises at execution
    if the grids were built with different (width, depth, seed)."""
    it = iter(grids)
    out = next(it)
    for g in it:
        out = out.unionByName(g)
    out = _assert_uniform_params(out, "cms_merge", ["width", "depth", "seed"])
    return (
        out.groupBy("j", "bucket", "width", "depth", "seed")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .select("j", "bucket", "cnt", "width", "depth", "seed")
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
    broadcasts (constant size); the probe side is never shuffled.
    Raises at execution if the grid's parameter stamp differs from
    the (width, depth, seed) the probes are hashed with."""
    counters = _assert_params(
        counters, "cms_lookup", width=width, depth=depth, seed=seed
    )
    hashed = tokens.select(
        F.col(token_col).alias("token"),
        F.posexplode(
            _cms_bucket_array(F.col(token_col), width, depth, seed)
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
            _cms_bucket_array(F.col("token"), width, depth, seed)
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
    (idx, minv) + constant (m, seed) parameter stamp, at most m rows
    — the sketch's mergeable state.
    minv is the MIN of the post-index hash bits per register, which
    carries the max leading-zero rank (bitlen is monotone); persist
    it per epoch and fold epochs with hll_merge(). One map-side-
    combinable min() agg is the only corpus-sized stage."""
    _check_m(m)
    p = m.bit_length() - 1
    h = _hash60(F.col(value_col), seed)
    # idx from the low p bits, v from the high bits — bit ops, never
    # float division (a 60-bit value does not fit a double mantissa)
    reg = (
        df.select(
            h.bitwiseAND(F.lit(m - 1)).alias("idx"),
            F.shiftright(h, p).alias("v"),
        )
        .groupBy("idx")
        .agg(F.min("v").alias("minv"))
    )
    return _with_params(reg, m=m, seed=seed)


def hll_merge(*regs: DataFrame) -> DataFrame:
    """Fold register tables (e.g. one per crawl epoch) into one:
    elementwise min(minv) = elementwise max rank. Exactly equals the
    registers built from the unioned value sets — HLL state depends
    only on the set of hashes seen. Raises at execution if the
    register tables were built with different (m, seed)."""
    it = iter(regs)
    out = next(it)
    for r in it:
        out = out.unionByName(r)
    out = _assert_uniform_params(out, "hll_merge", ["m", "seed"])
    return (
        out.groupBy("idx", "m", "seed")
        .agg(F.min("minv").alias("minv"))
        .select("idx", "minv", "m", "seed")
    )


def hll_estimate(regs: DataFrame, m: int = 256) -> DataFrame:
    """Distinct-count estimate from a register table alone — the
    production monitoring path: no rescan of the corpus, just the
    <= m-row state. Output: one row (n_hll). Raises at execution if
    the registers' parameter stamp says they were built with a
    different m (the estimate would be silently garbage)."""
    regs = _assert_params(regs.drop("seed"), "hll_estimate", m=m)
    return _hll_stats(regs, m).select(F.round(F.col("__est"), 4).alias("n_hll"))


def _check_m(m: int) -> None:
    if m < 16 or (m & (m - 1)):
        raise ValueError("m must be a power of two >= 16")


# Flajolet et al. 2007 fig. 3: alpha_16/32/64 are tabulated exactly;
# the closed form 0.7213/(1+1.079/m) is the m >= 128 approximation
# (using it at m=16 would systematically overestimate by ~14%).
_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _hll_stats(reg: DataFrame, m: int) -> DataFrame:
    """(idx, minv) registers -> one row with the corrected HLL
    estimate in __est (plus Z and V for inspection)."""
    _check_m(m)
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
    alpha = _HLL_ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))
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


def hll_overlap(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    m: int = 256,
    seed: str = "hll-v1",
) -> DataFrame:
    """Sketch-based corpus-overlap estimate via inclusion-exclusion:
    |A ∩ B| ≈ est(A) + est(B) - est(A ∪ B), with est(A ∪ B) computed
    by MERGING the two register tables (HLL union is exact on the
    register level — no rescan of either corpus). The data-governance
    question this answers at 100 TB: "how much of the new crawl is
    already in the old corpus?" in O(m) state per side.

    Output: one row (n_a, n_b, n_union, n_intersect) — all estimates,
    rounded to 4 decimals; n_intersect floors at 0 (inclusion-
    exclusion on estimates can go slightly negative for disjoint
    sets).

    The three estimates share one parameter set by construction; the
    per-side register build is the only corpus-sized work (one
    map-side-combinable min() agg each)."""
    ra = hll_registers(a, value_col, m, seed)
    rb = hll_registers(b, value_col, m, seed)
    ru = hll_merge(ra, rb)
    ea = hll_estimate(ra, m).select(F.col("n_hll").alias("n_a"))
    eb = hll_estimate(rb, m).select(F.col("n_hll").alias("n_b"))
    eu = hll_estimate(ru, m).select(F.col("n_hll").alias("n_union"))
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .select(
            "n_a",
            "n_b",
            "n_union",
            F.round(
                F.greatest(
                    F.col("n_a") + F.col("n_b") - F.col("n_union"), F.lit(0.0)
                ),
                4,
            ).alias("n_intersect"),
        )
    )
