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
