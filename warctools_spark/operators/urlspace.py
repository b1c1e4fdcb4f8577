"""URL-space shape analysis: collapse URLs to path templates and
aggregate per (host, template) — the classic crawler-trap /
infinite-URL-space detector (calendar pages, session ids, faceted
search explosions). A scheduler starves templates whose URL counts
explode without new content; the crawl literature calls these spider
traps (IRLbot, Lee et al. 2009; also the motivation for URL
frontier budgets in Mercator, Heydon & Najork 1999). No reference
counterpart — warctools has no frontier analytics.

Template rule (deterministic, engine-portable — RE2-compatible
patterns shared verbatim with the DuckDB replay):
  1. hex runs of >= 8 chars CONTAINING AT LEAST ONE LETTER
     (session ids, content hashes) -> '{h}' — applied first so digit
     runs inside them don't split the token. The letter requirement
     keeps 8+-digit runs (dates like 20260817, epoch timestamps,
     growing numeric ids) in the '{n}' class, so a numeric id space
     straddling the 7/8-digit boundary stays ONE template. RE2 has
     no lookahead, so the condition is spelled as an exact 8-branch
     union over the position of the first letter.
  2. digit runs -> '{n}'
Query strings and fragments are dropped before templating (they are
the highest-cardinality trap axis; the template keeps only the path
shape). Host matches parse_url(..., 'HOST') semantics — userinfo
and port stripped, lowercased — so the output joins against every
other host-keyed operator (host_agg, host_quality_rollup,
ngram_novelty rollups). Host/path are taken with one regexp each
rather than parse_url so the oracle replay is the same expression.

Scale: an explicit two-level aggregation instead of count_distinct's
Expand rewrite — first collapse to (host, template, url) rows, then
to (host, template). Both stages are map-side combinable, so a trap
host emitting 10^7 urls of one template combines per task before
EITHER wire: the first shuffle's key includes the url (uniformly
spread by definition), and the second shuffle's input is one row per
distinct url that the partial agg collapses to one row per
(host, template) per task. No driver state, no skew beyond what the
partial aggs absorb — the same hot-key arithmetic as host_agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
_PATH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)"
# >= 8 hex chars with >= 1 letter, as a union over the first-letter
# position (RE2 has no lookahead; branch p: p leading digits, the
# letter, then enough hex to reach total length 8 — greedy tails
# extend every branch to the end of the run)
_HEX_RUN = "|".join(
    ["[0-9]{%d}[a-fA-F][0-9a-fA-F]{%d,}" % (p, 7 - p) for p in range(7)]
    + ["[0-9]{7,}[a-fA-F][0-9a-fA-F]*"]
)
_NUM_RUN = "[0-9]+"
# the fetchable url: everything before the fragment — '#section'
# variants are one url to a server and must not inflate n_distinct
_FETCH_RE = "^([^#]*)"


def url_templates(
    df: DataFrame,
    url_col: str = "url",
    min_urls: int = 1,
) -> DataFrame:
    """urls -> one row per (host, template):

      host        parse_url-HOST-equivalent (userinfo/port stripped,
                  lowercased)
      template    path with lettered hex runs -> '{h}', digit runs
                  -> '{n}'
      n_urls      input rows collapsing to the template
      n_distinct  distinct FETCHABLE urls among them (fragment
                  stripped — '#toc' variants are one url to a
                  server; n_urls > n_distinct means literal
                  refetches, not a widening space)
      sample_url  min over the fetchable urls — a stable example

    Rows whose url lacks a scheme://authority prefix are dropped
    (nothing to aggregate by). `min_urls` prunes the long tail at the
    agg output (post-shuffle — the partial agg has already collapsed
    the heavy templates, so the filter is on host×template rows, not
    urls).

    The trap signal is the caller's policy; the canonical one is
    `n_distinct` large while content novelty (e.g. ngram_novelty) is
    flat for the same host.
    """
    url = F.col(url_col)
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    path = F.regexp_extract(url, _PATH_RE, 1)
    template = F.regexp_replace(
        F.regexp_replace(path, _HEX_RUN, "{h}"), _NUM_RUN, "{n}"
    )
    fetch_url = F.regexp_extract(url, _FETCH_RE, 1)
    per_url = (
        df.where(host != "")
        .groupBy(
            host.alias("host"),
            template.alias("template"),
            fetch_url.alias("u"),
        )
        .agg(F.count("*").alias("c"))
    )
    return (
        per_url.groupBy("host", "template")
        .agg(
            F.sum("c").alias("n_urls"),
            F.count("*").alias("n_distinct"),
            F.min("u").alias("sample_url"),
        )
        .where(F.col("n_urls") >= min_urls)
    )
