"""Composed crawl-policy table: one row per host, joining the four
independent host signals the scheduler family produces —

  * link importance        graph.pagerank
  * seed-anchored trust    graph.trustrank       (when seeds given)
  * URL-space trap shape   urlspace.url_templates (rolled up per host)
  * content quality        text_analysis.host_quality_rollup

— plus the two classic derived signals: `spam_gap` (pagerank minus
trustrank: high-importance-low-trust is the TrustRank paper's spam
detector) and `trap_ratio` (the fraction of a host's distinct URL
space concentrated in its single biggest path template: calendar
pages / session-id explosions approach 1.0, IRLbot's starvation
signal).

This is deliberately a FEATURE table, not a policy: every scheduler
weighs these differently, so the composition emits the signals and a
deterministic default ordering (`policy_rank`) rather than baking
weights in. Policy: trust (or pagerank when unseeded) descending,
quality descending, trap_ratio ascending, host ascending — a total
order, so the rank is engine-exact.

Scale: each component is individually budgeted (see SCALE.md); the
composition adds four host-keyed joins of already-aggregated
host-sized tables (full-outer, so a host seen by only some signals
keeps a row with nulls where unmeasured), and the rank uses
`global_rank` — the range-shard + offset pattern, NOT a single-task
row_number window. At 10^8 hosts the join inputs are a few GB — the
same class as host_agg. For schedulers that only need the features,
`rank=False` skips the ranking pass entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame, *sort_exprs, out_col: str = "rank", n_shards: int | None = None
) -> DataFrame:
    """Exact global 1-based rank under a TOTAL order, without the
    single-task trap: a bare row_number() over an unpartitioned
    window serializes the whole table through one reducer, so instead
    this uses the classic distributed ranking pattern —
    repartitionByRange on the sort keys (contiguous sorted shards),
    row_number WITHIN each shard, plus a broadcast map of cumulative
    shard counts (n_shards rows through the driver, never data).

    The result is a pure function of the data: range-sampling moves
    shard BOUNDARIES, never a row's position in the total order —
    which is why `sort_exprs` MUST be a total order (tie-break on a
    unique column) or ranks within a tie straddling a boundary would
    be arbitrary. The ranked table is checkpointed once so the count
    pass and the output pass see the identical partitioning."""
    n = n_shards or df.sparkSession.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(n, *sort_exprs)
        .sortWithinPartitions(*sort_exprs)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["__pid"]: r["c"]
        for r in parted.groupBy("__pid").agg(F.count("*").alias("c")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    omap = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    w = Window.partitionBy("__pid").orderBy(*sort_exprs)
    return (
        parted.withColumn(
            out_col,
            (F.row_number().over(w) + omap[F.col("__pid")]).cast("long"),
        )
        .drop("__pid")
    )


def host_url_shape(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host rollup of url_templates: total distinct fetchable
    urls, template count, and `trap_ratio` = distinct urls in the
    biggest template / total distinct urls (1.0 = the whole URL space
    is one exploding shape). Output: (host, n_urls, n_templates,
    trap_ratio)."""
    from warctools_spark.operators.urlspace import url_templates

    t = url_templates(urls, url_col=url_col)
    return t.groupBy("host").agg(
        F.sum("n_distinct").cast("long").alias("n_urls"),
        F.count("*").cast("long").alias("n_templates"),
        F.round(
            F.max("n_distinct") / F.sum("n_distinct").cast("double"), 6
        ).alias("trap_ratio"),
    )


def host_reputation(
    edges: DataFrame,
    urls: DataFrame,
    docs: DataFrame,
    seeds=None,
    n_iter: int = 10,
    url_col: str = "url",
    rank: bool = True,
) -> DataFrame:
    """One row per host seen by ANY signal:

      host, pagerank, trustrank, spam_gap, n_urls, n_templates,
      trap_ratio, n_docs, mean_quality, n_langs, lang_entropy
      [, policy_rank]

    `edges` is the host link graph (src_host, dst_host[, n_links —
    used as weight when present]); `urls` any table with a url
    column; `docs` a documents table with (host, text, lang).
    Without `seeds`, trustrank and spam_gap are null. Signal columns
    are null where that signal never saw the host — 0 would be a
    claim, null is honest absence (graph scores ARE 0 when the graph
    saw the host but gives it no mass)."""
    from warctools_spark.operators.graph import pagerank, trustrank
    from warctools_spark.operators.text_analysis import host_quality_rollup

    weight = "n_links" if "n_links" in edges.columns else None
    pr = pagerank(edges, n_iter=n_iter, weight_col=weight).withColumnRenamed(
        "node", "host"
    )
    shape = host_url_shape(urls, url_col=url_col)
    quality = host_quality_rollup(docs)
    out = pr.join(shape, "host", "full").join(quality, "host", "full")
    if seeds is not None:
        tr = trustrank(
            edges, seeds, n_iter=n_iter, weight_col=weight
        ).withColumnRenamed("node", "host")
        out = out.join(tr, "host", "full").withColumn(
            "spam_gap", F.round(F.col("pagerank") - F.col("trustrank"), 6)
        )
    else:
        out = out.withColumn(
            "trustrank", F.lit(None).cast("double")
        ).withColumn("spam_gap", F.lit(None).cast("double"))
    out = out.select(
        "host",
        "pagerank",
        "trustrank",
        "spam_gap",
        "n_urls",
        "n_templates",
        "trap_ratio",
        "n_docs",
        "mean_quality",
        "n_langs",
        "lang_entropy",
    )
    if not rank:
        return out
    anchor = F.col("trustrank") if seeds is not None else F.col("pagerank")
    return global_rank(
        out,
        F.coalesce(anchor, F.lit(-1.0)).desc(),
        F.coalesce(F.col("mean_quality"), F.lit(-1.0)).desc(),
        F.coalesce(F.col("trap_ratio"), F.lit(2.0)).asc(),
        F.col("host").asc(),
        out_col="policy_rank",
    )
