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

_MOD = 1_000_000


def hash_unit(id_col: Column, seed: str) -> Column:
    """Uniform [0,1) from md5(seed:id) — first 60 bits of the digest
    (same md5->int trick as the MinHash family; engine-portable)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed + ":"), id_col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return (h % _MOD) / F.lit(float(_MOD))


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
