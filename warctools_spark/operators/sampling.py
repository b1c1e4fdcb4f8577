"""Deterministic corpus sampling / domain mixing.

Training-data pipelines mix sources at fixed ratios (e.g. 60% web,
30% books, 10% code) and need the sample to be REPRODUCIBLE across
reruns and cluster sizes — Spark's df.sample() is seeded per
partition, so the selected set changes with the split layout. These
operators hash row identity instead: membership is a pure function of
(seed, id), independent of partitioning, executor count, or input
order, and replayable in any engine with md5.

Scale: a hash + filter on the scan — no shuffle, no state, prunes to
(id, stratum) columns. The optional per-stratum report is one
map-side-combined hash agg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from warctools_spark.functions.exprs import portable_hash60

_MOD = 1_000_000


def hash_unit(id_col: Column, seed: str) -> Column:
    """Uniform [0,1) from md5(seed:id) — first 60 bits of the digest
    (portable_hash60; engine-portable)."""
    return (portable_hash60(id_col, seed) % _MOD) / F.lit(float(_MOD))


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    seed: str = "mix-v1",
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each row iff hash_unit(seed, id) < fraction[its stratum].
    Strata absent from `fractions` are dropped (fraction 0)."""
    frac = F.lit(0.0)
    for name, f in sorted(fractions.items()):
        frac = F.when(F.col(stratum_col) == name, F.lit(float(f))).otherwise(frac)
    return docs.where(hash_unit(F.col(id_col), seed) < frac)


def mix_report(
    docs: DataFrame,
    sampled: DataFrame,
    stratum_col: str = "source",
) -> DataFrame:
    """Achieved-vs-corpus mixing ratios per stratum (audit table)."""
    tot = docs.groupBy(stratum_col).agg(F.count("*").alias("n_corpus"))
    got = sampled.groupBy(stratum_col).agg(F.count("*").alias("n_sampled"))
    return (
        tot.join(got, stratum_col, "left")
        .select(
            stratum_col,
            "n_corpus",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
            F.round(
                F.coalesce("n_sampled", F.lit(0)) / F.col("n_corpus"), 6
            ).alias("achieved_frac"),
        )
    )


def fixed_n_sample(
    docs: DataFrame,
    n_per_stratum: int,
    seed: str = "mix-v1",
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly-N-per-stratum deterministic sample: rank rows inside
    each stratum by the (seed, id) hash and keep the N smallest.
    Unlike fraction sampling this guarantees exact counts (eval-set
    carving, per-domain caps); like it, the selection is independent
    of partitioning and rerun-stable.

    Scale: rank-within-group compiles to WindowGroupLimit — Spark
    pushes the top-N below the shuffle, so each map task ships at most
    N rows per stratum it sees, never the full stratum (same plan
    property as the politeness scheduler, pinned in
    test_plan_quality)."""
    from pyspark.sql import Window

    h = hash_unit(F.col(id_col), seed)
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        docs.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def skew_report(
    df: DataFrame, key_col: str, top_k: int = 10
) -> DataFrame:
    """Shuffle-skew diagnostics for a prospective groupBy/join key:
    the top-k hottest key values with their share of all rows and the
    ratio to a perfectly uniform spread. The pre-flight check before
    keying a 100 TB shuffle — a max_over_uniform in the thousands
    says salt (or use the min-over-struct agg pattern) first.

    One hash agg + exact top-k; the tiny totals row is broadcast."""
    counts = df.groupBy(key_col).agg(F.count("*").alias("n"))
    totals = counts.agg(
        F.sum("n").alias("total_rows"),
        F.count("*").alias("n_keys"),
    )
    top = counts.orderBy(F.col("n").desc(), F.col(key_col)).limit(top_k)
    return top.crossJoin(F.broadcast(totals)).select(
        key_col,
        "n",
        F.round(F.col("n") / F.col("total_rows"), 6).alias("row_share"),
        F.round(
            F.col("n") / (F.col("total_rows") / F.col("n_keys")), 6
        ).alias("max_over_uniform"),
    )


def split_assign(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    seed: str = "split-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row lands in the
    split whose cumulative-weight interval contains hash_unit(seed,
    id). Pure map-side expression — no shuffle, no sampling variance,
    identical at any parallelism and on any re-run (the property a
    100 TB corpus split MUST have: re-computing a lost partition
    cannot reshuffle examples between train and test). Weights are
    normalized; interval edges follow sorted split names so the
    assignment is independent of dict order."""
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = float(sum(weights.values()))
    expr = None
    cum = 0.0
    u = hash_unit(F.col(id_col), seed)
    items = sorted(weights.items())
    for name, w in items[:-1]:
        # round the cumulative threshold to 12 decimals: float
        # accumulation makes 0.05 + 0.9 = 0.9500000000000001, which
        # would classify a row hashing to exactly u = 0.95 differently
        # from the documented (and oracle's) literal 0.95 boundary
        cum = round(cum + w / total, 12)
        cond = u < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return docs.withColumn("split", expr)


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169). Public method, no reference counterpart
# (warctools has no data-selection stage); cited for parity with the
# paper's hashed-n-gram formulation only.
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 4096


def _hash_mod(col: Column, seed: str, mod: int) -> Column:
    """portable_hash60 reduced mod `mod` (DuckDB replica:
    CAST(('0x' || substr(md5(...), 1, 15)) AS BIGINT) % mod)."""
    return portable_hash60(col, seed) % F.lit(mod)


def _hashed_gram_counts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
    seed: str,
) -> DataFrame:
    """Per-doc hashed-n-gram feature counts: whitespace unigrams +
    space-joined bigrams, each hashed into `n_buckets` buckets ->
    (id, bucket, c). The per-doc pre-aggregation is deliberate: every
    downstream join touches this (sub-vocabulary-sized per doc) table,
    never the exploded occurrence stream — the same join-input-
    reduction that fixed bigram_logprob's skew."""
    w = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    empty = F.array().cast("array<string>")
    bi = F.when(
        F.size(w) >= 2,
        F.zip_with(
            F.slice(w, 1, F.size(w) - 1),
            F.slice(w, 2, F.size(w) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(empty)
    grams = df.select(
        F.col(id_col).alias("__id"),
        *([F.col("__is_target")] if "__is_target" in df.columns else []),
        F.explode(F.concat(w, bi)).alias("gram"),
    )
    keys = ["__id"] + (
        ["__is_target"] if "__is_target" in df.columns else []
    )
    return (
        grams.select(
            *keys, _hash_mod(F.col("gram"), seed, n_buckets).alias("bucket")
        )
        .groupBy(*keys, "bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )


def _bucket_log_ratio(
    docs_b: DataFrame,
    target_b: DataFrame,
    n_buckets: int,
    alpha: float,
) -> DataFrame:
    """The DSIR importance log-ratio per bucket over the FULL bucket
    domain: lam_b = ln p_hat(b) - ln q_hat(b), with add-alpha
    smoothing p_hat(b) = (p_b + a) / (P + a*B). Returns exactly
    `n_buckets` rows — a constant-size (feature-dim) table that
    broadcasts no matter the corpus size."""
    spark = docs_b.sparkSession
    q = docs_b.groupBy("bucket").agg(F.sum("c").cast("long").alias("qn"))
    p = target_b.groupBy("bucket").agg(F.sum("c").cast("long").alias("pn"))
    dom = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    lam = (
        dom.join(p, "bucket", "left")
        .join(q, "bucket", "left")
        .crossJoin(
            F.broadcast(
                p.agg(F.sum("pn").cast("double").alias("__P")).crossJoin(
                    q.agg(F.sum("qn").cast("double").alias("__Q"))
                )
            )
        )
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("pn"), F.lit(0)).cast("double") + alpha)
                    / (F.col("__P") + alpha * n_buckets)
                )
                - F.log(
                    (F.coalesce(F.col("qn"), F.lit(0)).cast("double") + alpha)
                    / (F.col("__Q") + alpha * n_buckets)
                )
            ).alias("lam"),
        )
    )
    return lam


def dsir_weights(
    docs: DataFrame,
    target: DataFrame | None = None,
    n_buckets: int = _DSIR_BUCKETS,
    alpha: float = 1.0,
    seed: str = "dsir-v1",
    text_col: str = "text",
    id_col: str = "doc_id",
    target_predicate: Column | str | None = None,
) -> DataFrame:
    """DSIR importance log-weights: score every raw document by how
    much more likely its hashed-n-gram bag is under the TARGET
    distribution (e.g. a trusted high-quality subset) than under the
    raw corpus itself — log w(x) = sum over grams of
    [ln p_target(bucket) - ln q_raw(bucket)], add-alpha smoothed.
    This is the data-selection scoring stage of Xie et al. 2023.

    Output: (id, n_grams, log_weight), one row per input doc; docs
    with no grams (empty/whitespace text) keep a row with n_grams=0
    and log_weight=0.0 — a selection pass must never change corpus
    row count.

    Scale: two hash aggs over the gram stream (map-side combined),
    then every join is per-doc-pre-aggregated counts against a
    constant `n_buckets`-row broadcast table — no corpus-sized
    shuffle keyed on skewed grams ("the the" never becomes a hot
    join key because only its bucket's COUNT travels).

    When the target is a SUBSET of `docs` selected by a row predicate
    (the common call), pass `target_predicate` (SQL string or Column)
    instead of a second DataFrame: the gram stream is then tokenized
    and hashed ONCE, with the per-doc target flag carried through the
    pre-agg — identical output, half the hashing on a target-heavy
    corpus."""
    if (target is None) == (target_predicate is None):
        raise ValueError(
            "pass exactly one of `target` (a DataFrame) or "
            "`target_predicate` (a row predicate over docs)"
        )
    if target_predicate is not None:
        pred = (
            F.expr(target_predicate)
            if isinstance(target_predicate, str)
            else target_predicate
        )
        both = _hashed_gram_counts(
            docs.withColumn("__is_target", pred.cast("boolean")),
            text_col,
            id_col,
            n_buckets,
            seed,
        )
        docs_b = both.drop("__is_target")
        target_b = both.where(F.col("__is_target")).drop("__is_target")
    else:
        docs_b = _hashed_gram_counts(docs, text_col, id_col, n_buckets, seed)
        target_b = _hashed_gram_counts(
            target, text_col, id_col, n_buckets, seed
        )
    lam = _bucket_log_ratio(docs_b, target_b, n_buckets, alpha)
    wts = (
        docs_b.join(F.broadcast(lam), "bucket")
        .groupBy("__id")
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.round(F.sum(F.col("c") * F.col("lam")), 4).alias("log_weight"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("__id"))
        .join(wts, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0).cast("long")).alias("n_grams"),
            F.coalesce(F.col("log_weight"), F.lit(0.0)).alias("log_weight"),
        )
    )


def dsir_select(
    docs: DataFrame,
    target: DataFrame | None = None,
    k: int = 100,
    n_buckets: int = _DSIR_BUCKETS,
    alpha: float = 1.0,
    seed: str = "dsir-v1",
    text_col: str = "text",
    id_col: str = "doc_id",
    target_predicate: Column | str | None = None,
) -> DataFrame:
    """DSIR selection stage: Gumbel-top-k resampling over the
    importance weights — equivalent to sampling k docs without
    replacement with probability proportional to w(x) (Xie et al.
    2023 §2.2; Gumbel trick: argtop-k of log w + Gumbel noise). The
    noise is DERIVED from md5(id), not drawn, so the selected set is
    a pure function of (seed, corpus) — reproducible across reruns,
    partitionings and engines, like every sampler in this module.

    Scores are rounded to 4 decimals BEFORE the top-k ordering with
    doc id as the total tie-break, so the selection is stable under
    last-ulp accumulation differences (ORACLES.md #5/#9).

    Scale: top-k by ORDER BY+LIMIT compiles to TakeOrderedAndProject
    — per-partition heaps then a driver merge of k rows, never a
    global sort."""
    wts = dsir_weights(
        docs,
        target,
        n_buckets,
        alpha,
        seed,
        text_col,
        id_col,
        target_predicate=target_predicate,
    )
    # u in (0,1): (h + 0.5) / MOD can't hit the ln(0) endpoints
    h = _hash_mod(F.col(id_col), seed + "-gumbel", _MOD)
    u = (h.cast("double") + 0.5) / F.lit(float(_MOD))
    g = -F.log(-F.log(u))
    return (
        wts.withColumn("dsir_score", F.round(F.col("log_weight") + g, 4))
        .orderBy(F.col("dsir_score").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "n_grams", "log_weight", "dsir_score")
    )


def temperature_rates(
    docs: DataFrame,
    alpha: float = 0.3,
    n_target: int | None = None,
    stratum_col: str = "source",
) -> DataFrame:
    """Temperature-based mixing rates (the multilingual-LM exponent
    sampling of Lample & Conneau 2019 §3.1, also mT5/XLM-R): target
    share of stratum i is

        q_i = p_i^alpha / sum_j p_j^alpha,   p_i = n_i / N

    alpha < 1 flattens the head (boosts low-resource strata), alpha=1
    keeps natural proportions, alpha=0 is uniform. Output per
    stratum: n_corpus, p (natural share), q (target share), and —
    when `n_target` is given — `rate`, the per-row keep probability
    min(1, n_target * q_i / n_i) realizing q in expectation under the
    budget. All from ONE count agg; the power/normalize runs on the
    stratum-sized table (round-9, ORACLES.md #5)."""
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    # null-stratum rows are excluded from the normalization: they can
    # never equi-join back to a rate in temperature_mix, so counting
    # them would waste their q mass and systematically undershoot
    # n_target (r5 ADVICE fix)
    counts = (
        docs.where(F.col(stratum_col).isNotNull())
        .groupBy(stratum_col)
        .agg(F.count("*").cast("long").alias("n_corpus"))
    )
    tot = F.broadcast(
        counts.agg(
            F.sum("n_corpus").cast("double").alias("__N"),
        )
    )
    base = counts.crossJoin(tot).withColumn(
        "__w", F.pow(F.col("n_corpus") / F.col("__N"), F.lit(float(alpha)))
    )
    z = F.broadcast(base.agg(F.sum("__w").alias("__Z")))
    out = (
        base.crossJoin(z)
        .select(
            stratum_col,
            "n_corpus",
            F.round(F.col("n_corpus") / F.col("__N"), 9).alias("p"),
            F.round(F.col("__w") / F.col("__Z"), 9).alias("q"),
            *(
                [
                    F.round(
                        F.least(
                            F.lit(1.0),
                            F.lit(float(n_target))
                            * (F.col("__w") / F.col("__Z"))
                            / F.col("n_corpus"),
                        ),
                        9,
                    ).alias("rate")
                ]
                if n_target is not None
                else []
            ),
        )
    )
    return out


def temperature_mix(
    docs: DataFrame,
    alpha: float = 0.3,
    n_target: int = 1000,
    seed: str = "temp-mix-v1",
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sample the corpus to the temperature-mixed target: keep a row
    iff hash_unit(seed, id) < rate(its stratum). Deterministic —
    the same (corpus, alpha, n_target, seed) always selects the same
    rows at any parallelism, and the achieved mix converges to q_i
    (mix_report audits it). Join is a broadcast of the stratum-sized
    rate table."""
    rates = temperature_rates(docs, alpha, n_target, stratum_col).select(
        stratum_col, "rate"
    )
    return docs.join(F.broadcast(rates), stratum_col).where(
        hash_unit(F.col(id_col), seed) < F.col("rate")
    ).drop("rate")
