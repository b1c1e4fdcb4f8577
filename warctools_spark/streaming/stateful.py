"""Custom stateful streaming operator: cross-batch per-host politeness
budget via applyInPandasWithState.

The watermarked dropDuplicates in frontier_stream handles seen-ness;
this operator handles *rate*: a host may only be scheduled
`budget_per_host` times over the lifetime of the stream (or until its
state times out), no matter how many micro-batches its URLs arrive in.
That is state the stateless window cannot express — the canonical use
of applyInPandasWithState (GroupState keyed by host).

Emitted rows keep arrival order per host (event time, then url) and
carry `host_seq`, the cumulative per-host schedule position.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("canon_url", T.StringType()),
        T.StructField("url_sha1", T.StringType()),
        T.StructField("host_seq", T.IntegerType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("emitted", T.IntegerType())])


def rate_limit_per_host(links: DataFrame, budget_per_host: int) -> DataFrame:
    """links(host, canon_url, url_sha1, warc_ts) -> at most
    budget_per_host rows per host across the whole stream."""

    def limiter(key, pdfs, state: GroupState):
        (host,) = key
        emitted = state.get[0] if state.exists else 0
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["warc_ts", "canon_url"])
            for _, row in pdf.iterrows():
                if emitted >= budget_per_host:
                    break
                emitted += 1
                out.append(
                    {
                        "host": host,
                        "canon_url": row["canon_url"],
                        "url_sha1": row["url_sha1"],
                        "host_seq": emitted,
                    }
                )
        state.update((emitted,))
        if out:
            yield pd.DataFrame(out)
        else:
            yield pd.DataFrame(
                {"host": [], "canon_url": [], "url_sha1": [], "host_seq": []}
            )

    return links.groupBy("host").applyInPandasWithState(
        limiter,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SCHED_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("canon_url", T.StringType()),
        T.StructField("url_sha1", T.StringType()),
        T.StructField("host_seq", T.IntegerType()),
        T.StructField("batch_ord", T.IntegerType()),
    ]
)

SCHED_STATE_SCHEMA = T.StructType(
    [
        T.StructField("used", T.IntegerType()),
        T.StructField("batches_seen", T.IntegerType()),
    ]
)


def budgeted_schedule_stream(
    links: DataFrame,
    k_per_batch: int,
    total_budget: int,
    budget_window_ms: int | None = None,
) -> DataFrame:
    """Politeness scheduling whose budget SURVIVES micro-batch edges —
    the stateful twin of frontier_stream.schedule_micro_batches, which
    re-budgets every batch independently.

    Per batch a host gets at most k_per_batch slots, ranked by
    (warc_ts, canon_url) like the batch scheduler; across batches it
    gets at most total_budget until its state times out. With
    budget_window_ms set the state uses a processing-time timeout, so
    a quiet host's budget replenishes after the politeness window —
    the crawl-delay semantics of the batch engine's budgeted
    scheduler, carried by GroupState instead of a per-epoch join.

    Output rows carry host_seq (cumulative schedule position) and
    batch_ord (how many batches this host has appeared in), so tests
    and metrics can attribute rows to batch edges.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if budget_window_ms
        else GroupStateTimeout.NoTimeout
    )

    def scheduler(key, pdfs, state: GroupState):
        (host,) = key
        if state.hasTimedOut:
            # politeness window elapsed with no arrivals: replenish
            state.remove()
            yield pd.DataFrame(
                {c.name: [] for c in SCHED_OUTPUT_SCHEMA}
            )
            return
        used, batches_seen = state.get if state.exists else (0, 0)
        batches_seen += 1
        pdf = pd.concat(list(pdfs))
        pdf = pdf.sort_values(["warc_ts", "canon_url"])
        take = min(k_per_batch, max(0, total_budget - used), len(pdf))
        out = []
        for _, row in pdf.head(take).iterrows():
            used += 1
            out.append(
                {
                    "host": host,
                    "canon_url": row["canon_url"],
                    "url_sha1": row["url_sha1"],
                    "host_seq": used,
                    "batch_ord": batches_seen,
                }
            )
        state.update((used, batches_seen))
        if budget_window_ms:
            state.setTimeoutDuration(budget_window_ms)
        if out:
            yield pd.DataFrame(out)
        else:
            yield pd.DataFrame(
                {c.name: [] for c in SCHED_OUTPUT_SCHEMA}
            )

    return links.groupBy("host").applyInPandasWithState(
        scheduler,
        outputStructType=SCHED_OUTPUT_SCHEMA,
        stateStructType=SCHED_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


CHANGE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("entity", T.StringType()),
        T.StructField("n_changes", T.IntegerType()),
        T.StructField("first_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("next_due_us", T.LongType()),
    ]
)

CHANGE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.IntegerType()),
        T.StructField("first_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def track_change_rate(events: DataFrame, default_interval_us: int = 3600 * 1_000_000) -> DataFrame:
    """Streaming twin of the batch recrawl_priority query: per entity,
    accumulate (count, first, last) of observed change events ACROSS
    micro-batches via GroupState and emit the updated next-due time
    each time the entity changes — the freshness scheduler a live
    crawler actually runs. events(entity, ts_us)."""

    def tracker(key, pdfs, state: GroupState):
        (entity,) = key
        if state.exists:
            n, first_us, last_us = state.get
        else:
            n, first_us, last_us = 0, None, None
        for pdf in pdfs:
            for ts in pdf["ts_us"]:
                ts = int(ts)
                n += 1
                first_us = ts if first_us is None else min(first_us, ts)
                last_us = ts if last_us is None else max(last_us, ts)
        state.update((n, first_us, last_us))
        if n > 1:
            interval = (last_us - first_us) // (n - 1)
        else:
            interval = default_interval_us
        yield pd.DataFrame(
            [
                {
                    "entity": entity,
                    "n_changes": n,
                    "first_us": first_us,
                    "last_us": last_us,
                    "next_due_us": last_us + interval,
                }
            ]
        )

    return events.groupBy("entity").applyInPandasWithState(
        tracker,
        outputStructType=CHANGE_OUTPUT_SCHEMA,
        stateStructType=CHANGE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CG_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_obs", T.LongType()),
        T.StructField("n_intervals", T.LongType()),
        T.StructField("n_changes", T.LongType()),
        T.StructField("sum_gap", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("last_digest", T.StringType()),
    ]
)

CG_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("n_obs", T.LongType()),
        T.StructField("n_intervals", T.LongType()),
        T.StructField("n_changes", T.LongType()),
        T.StructField("rate_per_hour", T.DoubleType()),
        T.StructField("next_due_us", T.LongType()),
    ]
)


def track_change_rate_cg(
    obs: DataFrame, cap_us: int = 30 * 24 * 3600 * 1_000_000
) -> DataFrame:
    """Streaming twin of the BATCH `frontier.change_rate` operator
    (Cho & Garcia-Molina bias-corrected Poisson estimator): per url,
    GroupState carries (n_obs, n_intervals, n_changes, sum_gap,
    last_us, last_digest) across micro-batches and each update emits
    exactly the batch operator's output row — the two are EQUAL when
    every url's observations arrive in timestamp order across batches
    (pinned by test). rate_per_hour replicates Spark's ROUND semantics
    (shortest-repr decimal, HALF_UP — r5 ADVICE: Python's bare round()
    is HALF_EVEN and could diverge at decimal ties); the remaining
    theoretical gap is a possible 1-ULP difference between C libm and
    JVM Math.log, which round-6 absorbs except at astronomically
    unlucky boundaries — EQUAL is exact up to that caveat. The batch
    twin also keeps a null-url group row (its window key admits null)
    while the stream must drop null urls pre-state; parity statements
    are over non-null urls. Within a micro-batch rows are processed in
    (ts_us, digest) order, matching the batch window's sort; an
    observation arriving with ts earlier than the stored last_us is
    still folded in arrival order — the standard streaming
    late-data caveat, stated rather than hidden.

    obs(url, ts_us, digest). Output mode: update. Null-timestamp
    observations are dropped BEFORE the stateful operator for parity
    with the batch twin (which drops null/uncastable timestamps), and
    because a null makes Arrow hand pandas a float64 column whose NaN
    would crash int() in the tracker. (Float64 holds current-era
    microsecond epochs exactly — 2^53 covers to year ~2255 — so
    precision is not the issue; crash-vs-parity is.)"""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    obs = obs.where(F.col("ts_us").isNotNull() & F.col("url").isNotNull())

    def tracker(key, pdfs, state: GroupState):
        (url,) = key
        if state.exists:
            n_obs, n_iv, n_ch, gap, last_us, last_d = state.get
        else:
            n_obs, n_iv, n_ch, gap, last_us, last_d = 0, 0, 0, 0, None, None
        rows = []
        for pdf in pdfs:
            rows.extend(
                (int(t), None if d is None else str(d))
                for t, d in zip(pdf["ts_us"], pdf["digest"])
            )
        rows.sort(key=lambda r: (r[0], "" if r[1] is None else r[1]))
        for ts, d in rows:
            if n_obs > 0:
                n_iv += 1
                gap += ts - last_us
                if d != last_d:
                    n_ch += 1
            n_obs += 1
            last_us, last_d = ts, d
        state.update((n_obs, n_iv, n_ch, gap, last_us, last_d))
        if n_iv > 0 and gap > 0:
            lam = (
                -math.log((float(n_iv) - float(n_ch) + 0.5) / (float(n_iv) + 0.5))
                * float(n_iv)
                / float(gap)
            )
            # Spark F.round parity: BigDecimal.valueOf(double) parses
            # the shortest round-trip repr and rounds HALF_UP; bare
            # round() is HALF_EVEN and diverges at round-6 decimal
            # ties (r5 ADVICE fix)
            rate = float(
                Decimal(repr(lam * 3.6e9)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )
        else:
            lam, rate = 0.0, 0.0
        if n_ch > 0 and gap > 0:
            due = last_us + min(cap_us, math.floor(1.0 / lam))
        else:
            due = last_us + cap_us
        yield pd.DataFrame(
            [
                {
                    "url": url,
                    "n_obs": n_obs,
                    "n_intervals": n_iv,
                    "n_changes": n_ch,
                    "rate_per_hour": rate,
                    "next_due_us": due,
                }
            ]
        )

    return obs.groupBy("url").applyInPandasWithState(
        tracker,
        outputStructType=CG_OUTPUT_SCHEMA,
        stateStructType=CG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
