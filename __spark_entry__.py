"""Driver contract for the warctools_spark engine.

entry(spark)    — flagship crawl-frontier epoch at sf0.001.
queries()       — one entry per implemented operator (SURVEY.md §2 +
                  the training-data operator family).
oracle_sql()    — DuckDB-equivalent SQL for every SQL-expressible
                  query; binary/UDF-kernel operators ship rows-only.

The synthetic pages corpus (sources/pages.py) is a pure function of
documents.parquet, so the DuckDB oracle can model it numerically:
`extract_text` literally reconstructs the expected HTML document in
SQL and compares it against the engine's full UDF pipeline
(HTTP wire decode -> inflate -> charset decode), which makes the
byte-parity invariant a driver-checked property.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

N_LINKS = 8
SEEN_MOD = 5  # doc_id % 5 == 0 pages are pre-seen in frontier queries
TOPK = 3
HOT_N = 50


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _pages(spark, sf_dir):
    from warctools_spark.sources.pages import synthesize_pages

    return synthesize_pages(spark, sf_dir)


# --------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """One politeness-scheduled frontier epoch on sf0.001: pages ->
    decode -> harvest -> canonicalize -> dedup vs seen -> top-k per
    host schedule."""
    sf_dir = "/root/testdata/sf0.001"
    from warctools_spark.plans.epoch import init_state, run_epoch
    from warctools_spark.sources.pages import url_for

    pages = _pages(spark, sf_dir)
    n = _docs(spark, sf_dir).count()
    seeds = spark.createDataFrame(
        [(url_for(i),) for i in range(0, n, 7)], "url string"
    )
    queue, seen = init_state(seeds)
    res = run_epoch(spark, pages, queue, seen, epoch=0, k_per_host=10)
    return res.schedule.select("canon_url", "host", "depth", "url_sha1")


# --------------------------------------------------------------------
# Spark-side queries
# --------------------------------------------------------------------

def _q_page_index(spark, sf_dir):
    """warcindex-style projection of the pages table
    (warcindex.py:35-49 -> SURVEY §2.3)."""
    from warctools_spark.functions.udfs import udf_url_host

    pages = _pages(spark, sf_dir)
    return pages.select(
        F.col("url"),
        udf_url_host(F.col("url")).alias("host"),
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("warc_date"),
        F.length("text").alias("content_length"),
        F.col("lang"),
    )


def _q_filter_url(spark, sf_dir):
    """warcfilter -U url-regex predicate (warcfilter.py:81-83)."""
    pages = _pages(spark, sf_dir)
    return pages.where(F.col("url").rlike(r"^http://hot\.")).select("url")


def _q_filter_url_invert(spark, sf_dir):
    """warcfilter -U -i inverted match (warcfilter.py:82 XOR invert)."""
    pages = _pages(spark, sf_dir)
    return pages.where(
        ~F.coalesce(F.col("url").rlike(r"/doc/1\d\.html$"), F.lit(False))
    ).select("url")


def _q_filter_body(spark, sf_dir):
    """warcfilter default mode: body regex over the *decoded* payload
    (warcfilter.py:104-113) — runs the real HTTP decode UDF."""
    from warctools_spark.functions.udfs import udf_extract_text

    pages = _pages(spark, sf_dir)
    return (
        pages.withColumn("body", udf_extract_text("html"))
        .where(F.col("body").rlike("window"))
        .select("url")
    )


def _q_extract_text(spark, sf_dir):
    """BYTE-PARITY: full wire decode (plain/gzip/chunked/chunked+gzip)
    vs the SQL-reconstructed document (messaging.py get_body +
    inflate semantics)."""
    from warctools_spark.functions.udfs import udf_extract_text

    pages = _pages(spark, sf_dir)
    return pages.select("url", udf_extract_text("html").alias("text"))


def _q_http_decode(spark, sf_dir):
    """HTTP triage struct: (code, mime, complete) per page
    (warcfilter.py:28-46)."""
    from warctools_spark.functions.udfs import udf_decode_http

    pages = _pages(spark, sf_dir)
    h = udf_decode_http("html")
    return pages.select(
        "url",
        h["code"].alias("code"),
        h["mime"].alias("mime"),
        h["complete"].cast("int").alias("complete"),
    )


def _q_harvest_links(spark, sf_dir):
    """Link harvest: HTML parse + absolutize + explode
    (warclinks.py:54-66) — checked against the numeric link model."""
    from warctools_spark.operators.frontier import harvest_links

    pages = _pages(spark, sf_dir)
    return harvest_links(pages).select("src_url", "link")


def _candidates(spark, sf_dir):
    from warctools_spark.functions.udfs import udf_url_sha1
    from warctools_spark.operators.frontier import (
        dedup_against_seen,
        dedup_within_epoch,
        harvest_canonicalized,
    )
    from warctools_spark.sources.pages import url_expr

    pages = _pages(spark, sf_dir)
    links = harvest_canonicalized(pages).withColumn("depth", F.lit(1))
    cand = dedup_within_epoch(links)
    n = _docs(spark, sf_dir).count()
    seen_ids = spark.range(0, n, SEEN_MOD).select(
        udf_url_sha1(url_expr(F.col("id"))).alias("url_sha1")
    )
    return dedup_against_seen(cand, seen_ids)


def _q_frontier_candidates(spark, sf_dir):
    """Within-epoch dedup + anti-join against the seen set
    (SURVEY §2.6 frontier \\ seen)."""
    return _candidates(spark, sf_dir).select("canon_url", "host", "src_url")


def _q_politeness_topk(spark, sf_dir):
    """Per-host politeness window: top-k by (depth, canon_url)
    (SURVEY §2.8)."""
    from warctools_spark.operators.frontier import politeness_schedule

    cand = _candidates(spark, sf_dir)
    return politeness_schedule(cand, TOPK).select("host", "canon_url")


def _q_politeness_topk_salted(spark, sf_dir):
    """The same window via the two-phase hot-host salting path — must
    return the identical schedule (skew hardening, SURVEY §4.2)."""
    from warctools_spark.operators.frontier import (
        detect_hot_hosts,
        politeness_schedule,
    )

    cand = _candidates(spark, sf_dir)
    hot = detect_hot_hosts(cand, HOT_N)
    return politeness_schedule(cand, TOPK, hot_hosts=hot, salt=8).select(
        "host", "canon_url"
    )


def _q_host_agg(spark, sf_dir):
    """Per-host frontier depth/budget aggregation (SURVEY §2.7)."""
    cand = _candidates(spark, sf_dir)
    return cand.groupBy("host").agg(
        F.count("*").alias("n_urls"),
        F.min("canon_url").alias("first_url"),
    )


def _q_seen_antijoin(spark, sf_dir):
    """Plain anti-join semantics on the documents table."""
    docs = _docs(spark, sf_dir)
    seen = docs.where(F.col("doc_id") % SEEN_MOD == 0).select("doc_id")
    return docs.join(seen, "doc_id", "left_anti").select("doc_id", "n_chars")


def _q_dedup_exact(spark, sf_dir):
    from warctools_spark.operators.dedup import exact_dedup

    return exact_dedup(_docs(spark, sf_dir))


def _q_dedup_exact_keep_first(spark, sf_dir):
    from warctools_spark.operators.dedup import exact_dedup_keep_first

    return exact_dedup_keep_first(_docs(spark, sf_dir)).select("doc_id", "n_chars")


def _q_minhash(spark, sf_dir):
    from warctools_spark.operators.dedup import minhash_signature

    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.concat_ws(
            ",", minhash_signature(F.col("text"), 8).cast("array<string>")
        ).alias("minhash_sig"),
    )


def _q_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard for consecutive-id pairs (the LSH verify
    stage), through the ngram_jaccard operator itself — certifying the
    shipped code path, including its guarded denominator (short docs
    score 0.0, not null)."""
    from warctools_spark.operators.dedup import ngram_jaccard

    docs = _docs(spark, sf_dir)
    pairs = docs.select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 1).alias("id_b"),
    )
    return ngram_jaccard(docs, pairs).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def _q_simhash(spark, sf_dir):
    from warctools_spark.operators.dedup import simhash60

    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", simhash60(F.col("text"), 3).alias("simhash"))


def _q_lang_id(spark, sf_dir):
    from warctools_spark.operators.text_analysis import lang_id

    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", lang_id(F.col("text")).alias("lang_pred"))


def _q_token_counts(spark, sf_dir):
    from warctools_spark.operators.text_analysis import (
        bpe_ish_token_count,
        token_count,
    )

    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        bpe_ish_token_count(F.col("text")).alias("n_bpe_units"),
    )


def _q_quality(spark, sf_dir):
    from warctools_spark.operators.text_analysis import quality_score

    docs = _docs(spark, sf_dir)
    return quality_score(docs).select(
        "doc_id",
        "n_tokens",
        "n_punct",
        "n_distinct_tokens",
        "quality_score",
    )


def _q_token_frequencies(spark, sf_dir):
    """Global corpus token statistics: exact top-200 tokens by count
    (tokenizer-training / vocab-audit stage)."""
    from warctools_spark.operators.text_analysis import token_frequencies

    return token_frequencies(_docs(spark, sf_dir), top_k=200)


def _q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag training docs sharing any
    13-gram with the 'benchmark' (docs 0..9 stand in for a held-out
    eval set)."""
    from warctools_spark.operators.dedup import decontaminate

    docs = _docs(spark, sf_dir)
    benchmark = docs.where(F.col("doc_id") < 10)
    return decontaminate(docs, benchmark)


def _q_repetition(spark, sf_dir):
    """Gopher-style repetition quality gates: per-doc duplicate-token
    and top-n-gram fractions (Rae et al. 2021 §A1.1)."""
    from warctools_spark.operators.text_analysis import repetition_features

    return repetition_features(_docs(spark, sf_dir))


def _q_segment_dedup(spark, sf_dir):
    """C4-style corpus-level segment dedup: keep the globally-first
    occurrence of every 10-token window, reassemble docs in order."""
    from warctools_spark.operators.dedup import segment_dedup

    return segment_dedup(_docs(spark, sf_dir), k=10)


MIX_FRACTIONS = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}
_MIX_FRAC_SQL = (
    "CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5 "
    "WHEN 'src2' THEN 0.25 WHEN 'src3' THEN 0.1 ELSE 0.0 END"
)


def _q_stratified_sample(spark, sf_dir):
    """Deterministic domain mixing: hash-gated per-source sampling,
    reproducible across partitionings/cluster sizes (unlike
    df.sample)."""
    from warctools_spark.operators.sampling import stratified_sample

    return stratified_sample(_docs(spark, sf_dir), MIX_FRACTIONS).select(
        "doc_id", "source"
    )


def _q_fixed_n_sample(spark, sf_dir):
    """Exactly-5-per-source deterministic sample (hash-ranked,
    WindowGroupLimit plan)."""
    from warctools_spark.operators.sampling import fixed_n_sample

    return fixed_n_sample(_docs(spark, sf_dir), 5).select(
        "doc_id", "source"
    )


def _q_corpus_mix(spark, sf_dir):
    """Achieved-vs-corpus mixing-ratio audit for the stratified
    sample."""
    from warctools_spark.operators.sampling import (
        mix_report,
        stratified_sample,
    )

    docs = _docs(spark, sf_dir)
    return mix_report(docs, stratified_sample(docs, MIX_FRACTIONS))


def _q_wet_records(spark, sf_dir):
    """WET derivation: response pages -> conversion records
    (extract text, serialize WARC conversion record with
    WARC-Refers-To, reparse) — verification columns replayed by the
    oracle from the document model."""
    from warctools_spark.operators.archive_ops import wet_conversion

    return wet_conversion(_pages(spark, sf_dir)).select(
        "url", "rec_type", "refers_to", "content_length", "payload_md5"
    )


def _q_training_corpus_v2(spark, sf_dir):
    """The modern composed chain: gopher gate -> exact dedup ->
    C4 segment dedup -> PII scrub, full-chain SQL oracle. The corpus
    is salted with synthesized duplicates so every stage provably
    fires: doc_id+100000 exact copies of docs 0..49 (dropped by exact
    dedup) and doc_id+200000 extended copies of docs 50..59 (their
    shared leading segments dropped by segment dedup)."""
    from warctools_spark.plans.corpus import prepare_training_corpus_v2

    docs = _docs(spark, sf_dir)
    exact_copies = docs.where(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    near_copies = docs.where(
        (F.col("doc_id") >= 50) & (F.col("doc_id") < 60)
    ).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" qq ww ee rr tt yy uu ii oo pp")
        ).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    corpus = docs.unionByName(exact_copies).unionByName(near_copies)
    return prepare_training_corpus_v2(corpus)


def _q_cdx_index(spark, sf_dir):
    """CDX-style replay index (SURT urlkey, ts14, mime, status,
    digest, length) over the pages corpus."""
    from warctools_spark.operators.archive_ops import cdx_index

    return cdx_index(_pages(spark, sf_dir))


def _q_robots_sitemaps(spark, sf_dir):
    """robots.txt Sitemap-directive discovery: one synthesized
    robots.txt per host runs through the real parse kernel
    (udf_parse_robots); the oracle replays the expected table from
    the host model."""
    from warctools_spark.operators.robots import parse_robots_table
    from warctools_spark.sources.pages import host_expr

    docs = _docs(spark, sf_dir)
    hosts = docs.select(host_expr(F.col("doc_id")).alias("host")).distinct()
    raw = hosts.select(
        "host",
        F.encode(
            F.concat(
                F.lit("User-agent: *\nDisallow: /private\nCrawl-delay: 1\n"),
                F.lit("Sitemap: http://"),
                F.col("host"),
                F.lit("/sitemap.xml\n"),
            ),
            "utf-8",
        ).alias("robots_txt"),
    )
    t = parse_robots_table(raw)
    return t.select(
        "host",
        F.explode("sitemaps").alias("sitemap_url"),
        "crawl_delay_ms",
    )


def _q_anchor_texts(spark, sf_dir):
    """Anchor-text harvest: (src_url, link, anchor) from decoded
    pages — training-data signal (anchor text describes the target)
    and crawl-priority feature. The whole <a ...>...</a> element is
    extracted in ONE regex pass and href/anchor are pulled from the
    SAME match, so a tag matching one sub-pattern but not the other
    (e.g. nested markup in the anchor) can never shift later
    (link, anchor) pairs out of alignment. JVM-only regexps; the full
    messy-HTML path stays with the link kernel."""
    from warctools_spark.functions.udfs import udf_extract_text
    from warctools_spark.operators.text_analysis import anchor_text_pairs

    pages = _pages(spark, sf_dir)
    return anchor_text_pairs(pages, udf_extract_text("html"), url_col="url")


def _q_host_graph(spark, sf_dir):
    """Host-level link graph with edge weights — the aggregation that
    feeds host-granularity PageRank/selection at Common-Crawl scale
    (one hash agg; hosts are ~5 orders smaller than URLs)."""
    from warctools_spark.operators.frontier import harvest_canonicalized

    pages = _pages(spark, sf_dir)
    edges = harvest_canonicalized(pages).select(
        F.parse_url("src_url", F.lit("HOST")).alias("src_host"),
        F.col("host").alias("dst_host"),
    )
    return edges.groupBy("src_host", "dst_host").agg(
        F.count("*").alias("n_links")
    )


def _q_pack_sequences(spark, sf_dir):
    """GPT-style sequence packing: distributed two-phase prefix sum
    over id-ordered token counts; oracle replays the logical
    sum() OVER (ORDER BY doc_id)."""
    from warctools_spark.operators.packing import pack_sequences

    return pack_sequences(_docs(spark, sf_dir), seq_len=128)


def _q_gopher_gate(spark, sf_dir):
    """Composed Gopher-style keep/drop gate with reasons."""
    from warctools_spark.operators.text_analysis import gopher_gate

    return gopher_gate(_docs(spark, sf_dir))


def _q_sitemap_seeds(spark, sf_dir):
    """Seed discovery: every doc_id%50==0 page publishes a sitemap of
    10 <loc> entries (deterministic link model); the operator gates on
    <urlset> and regexp-extracts the locs — the oracle replays the
    expected seed set straight from the numeric model, independently
    validating the XML extraction."""
    from warctools_spark.operators.frontier import sitemap_seeds
    from warctools_spark.sources.pages import url_expr

    docs = _docs(spark, sf_dir)
    cnt = docs.agg(F.count("*").alias("n"))
    loc = lambda j: F.concat(  # noqa: E731
        F.lit("<loc>"),
        url_expr((F.col("doc_id") + j * 7 + 1) % F.col("n")),
        F.lit("</loc>"),
    )
    sm = (
        docs.where(F.col("doc_id") % 50 == 0)
        .crossJoin(F.broadcast(cnt))
        .select(
            url_expr(F.col("doc_id")).alias("url"),
            F.concat(
                F.lit('<?xml version="1.0"?><urlset>'),
                F.concat_ws(
                    "", F.transform(F.sequence(F.lit(0), F.lit(9)), loc)
                ),
                F.lit("</urlset>"),
            ).alias("body"),
        )
    )
    return sitemap_seeds(sm)


def _q_scrub_pii(spark, sf_dir):
    """PII redaction: deterministic fake PII appended per doc (so the
    scrub provably fires), then the email/phone/ipv4 patterns redact
    to placeholders — pure regexp_replace chain, oracle-replayed."""
    from warctools_spark.operators.text_analysis import scrub_pii

    docs = _docs(spark, sf_dir)
    with_pii = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.org or +1 (555) 010-"),
            F.lpad(F.pmod(F.col("doc_id"), 10000).cast("string"), 4, "0"),
            F.lit(" at 10.0."),
            F.pmod(F.col("doc_id"), 256).cast("string"),
            F.lit(".7"),
        ).alias("dirty"),
    )
    return with_pii.select(
        "doc_id", scrub_pii(F.col("dirty")).alias("clean")
    ).where(
        ~F.col("clean").contains("@") & ~F.col("clean").contains("10.0.")
    )


def _q_fingerprint(spark, sf_dir):
    from warctools_spark.operators.text_analysis import doc_fingerprints

    return doc_fingerprints(_docs(spark, sf_dir))


def _q_embedding_topk(spark, sf_dir):
    from warctools_spark.operators.similarity import brute_force_topk

    emb = _emb(spark, sf_dir)
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return brute_force_topk(emb, [float(v) for v in qvec], k=10)


def _q_lsh_topk(spark, sf_dir):
    """ANN top-k via banded hyperplane LSH probe + exact rerank; the
    oracle replays the band keys (bit-exact left-fold dots) and the
    rerank."""
    from warctools_spark.operators.similarity import lsh_topk

    emb = _emb(spark, sf_dir)
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return lsh_topk(emb, [float(v) for v in qvec], k=10)


def _q_embedding_neardup(spark, sf_dir):
    """Exact within-label cosine>=0.3 near-duplicate pairs."""
    emb = _emb(spark, sf_dir).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    a, b = emb.alias("a"), emb.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda s: F.sqrt(  # noqa: E731
        F.aggregate(F.col(f"{s}.v"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        a.join(
            b,
            on=[
                F.col("a.label") == F.col("b.label"),
                F.col("a.vec_id") < F.col("b.vec_id"),
            ],
        )
        .withColumn("cosine", F.round(dot / (norm("a") * norm("b")), 6))
        .where(F.col("cosine") >= 0.3)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            "cosine",
        )
    )


def _q_tpch_q1(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def _q_tpch_q3ish(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        cust.where(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def _q_link_rank(spark, sf_dir):
    """PageRank-style crawl priority over the synthetic link graph
    (edges replayed from the numeric model; 3 synchronous iterations,
    unrolled in the oracle)."""
    from warctools_spark.operators.frontier import link_rank

    docs = _docs(spark, sf_dir)
    n = docs.count()
    edges = docs.select(
        F.col("doc_id").alias("src"),
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("i"),
    ).select(
        "src",
        ((F.col("src") * 31 + F.col("i") * 97 + 7) % n).alias("dst"),
    )
    ranks = link_rank(
        edges, docs.select(F.col("doc_id").alias("node")), iterations=3
    )
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def _q_bigram_frequencies(spark, sf_dir):
    """Global top-100 word bigrams (tokenizer merge candidates)."""
    from warctools_spark.operators.text_analysis import ngram_frequencies

    return ngram_frequencies(_docs(spark, sf_dir), n=2, top_k=100)


def _q_skew_report(spark, sf_dir):
    """Shuffle-skew pre-flight: hottest hosts of the candidate
    frontier with share + over-uniform ratio."""
    from warctools_spark.operators.sampling import skew_report

    cand = _candidates(spark, sf_dir)
    return skew_report(cand, "host", top_k=5)


def _q_mime_sniff(spark, sf_dir):
    """Magic-byte MIME sniffing: four synthesized blob shapes per doc
    (png / jpeg / IMG1 / unknown); the oracle replays the expected
    label per shape."""
    from warctools_spark.operators.multimodal import sniff_mime

    docs = _docs(spark, sf_dir)
    d = F.col("doc_id")
    payload_hex = F.md5(d.cast("string"))
    blob = F.unhex(
        F.concat(
            F.when(d % 4 == 0, F.lit("89504e470d0a1a0a"))
            .when(d % 4 == 1, F.lit("ffd8ff"))
            .when(d % 4 == 2, F.lit("494d4731"))  # 'IMG1'
            .otherwise(F.lit("68656c6c6f")),  # 'hello'
            payload_hex,
        )
    )
    return docs.select("doc_id", sniff_mime(blob).alias("mime"))


def _q_url_traps(spark, sf_dir):
    """Crawl-trap detection: four synthesized URL shapes per doc
    (clean / session-id / repeated-segment loop / deep path); the
    oracle replays the expected feature vector per shape, so the
    parse_url+split+filter pipeline is checked against an independent
    model."""
    from warctools_spark.operators.frontier import url_trap_features
    from warctools_spark.sources.pages import host_expr

    docs = _docs(spark, sf_dir)
    d = F.col("doc_id")
    base = F.concat(F.lit("http://"), host_expr(d))
    n = d.cast("string")
    url = (
        F.when(d % 4 == 0, F.concat(base, F.lit("/doc/"), n, F.lit(".html")))
        .when(
            d % 4 == 1,
            F.concat(
                base, F.lit("/doc/"), n, F.lit(".html?sess="), n,
                F.lit("&page=1"),
            ),
        )
        .when(
            d % 4 == 2,
            F.concat(base, F.lit("/cal/a/cal/a/cal/a/"), n, F.lit(".html")),
        )
        .otherwise(
            F.concat(base, F.lit("/a/b/c/d/e/f/g/h/"), n, F.lit(".html"))
        )
    )
    return url_trap_features(docs.select(url.alias("url")))


def _q_main_content(spark, sf_dir):
    """Boilerplate removal over decoded pages: chrome blocks dropped,
    tags stripped, entities unescaped, whitespace collapsed — the
    html-to-training-text cleanup, replayed by the oracle on the
    reconstructed document."""
    from warctools_spark.functions.udfs import udf_extract_text
    from warctools_spark.operators.text_analysis import strip_boilerplate

    pages = _pages(spark, sf_dir)
    return pages.select(
        "url", strip_boilerplate(udf_extract_text("html")).alias("main_text")
    )


def _q_corpus_summary(spark, sf_dir):
    """Per-language corpus audit: doc counts, token totals, exact
    p50/p90 token-length percentiles (linear interpolation — matches
    DuckDB quantile_cont)."""
    from warctools_spark.operators.text_analysis import token_count

    docs = _docs(spark, sf_dir).withColumn(
        "n_tokens", token_count(F.col("text"))
    )
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.expr("percentile(n_tokens, 0.5)"), 6).alias("p50_tokens"),
        F.round(F.expr("percentile(n_tokens, 0.9)"), 6).alias("p90_tokens"),
    )


def _q_revisit_records(spark, sf_dir):
    """Writer-side digest dedup: mirror copies (same payload, later
    timestamp, ?m=1 url) of docs 0..49 are salted in; the operator
    must emit them as `revisit` records referencing the original."""
    from warctools_spark.operators.archive_ops import revisit_records

    pages = _pages(spark, sf_dir)
    did = F.regexp_extract("url", r"/doc/(\d+)\.html", 1).cast("long")
    mirror = (
        pages.where(did < 50)
        .select(
            F.concat(F.col("url"), F.lit("?m=1")).alias("url"),
            (F.col("warc_ts") + F.expr("INTERVAL 1 HOUR")).alias("warc_ts"),
            "html",
            "text",
            "lang",
        )
    )
    corpus = pages.unionByName(mirror)
    return revisit_records(corpus).select(
        "url", "digest", "record_type", "refers_to_url"
    )


def _q_recrawl_priority(spark, sf_dir):
    """Freshness-driven recrawl scheduling: per entity, observed
    change events (the 'view' stream stands in as the change signal) give a change rate (events per hour of observed
    span); next_due = last_seen + 1/rate. The temporal half of crawl
    scheduling (politeness bounds how often you MAY fetch; change
    rate decides how often you SHOULD). One map-side-combined hash
    agg over the event log; exact microsecond arithmetic so the
    oracle replays it bit-for-bit."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    agg = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.count("*").alias("n_changes"),
        F.min(us).alias("first_us"),
        F.max(us).alias("last_us"),
    )
    span = F.col("last_us") - F.col("first_us")
    # interval between changes; single-change entities get the span
    # floor of 1 hour
    interval = F.when(
        F.col("n_changes") > 1,
        F.floor(span / (F.col("n_changes") - 1)).cast("long"),
    ).otherwise(F.lit(3600 * 1_000_000))
    return agg.select(
        "user_id",
        "n_changes",
        (F.col("last_us") + interval).alias("next_due_us"),
    )


def _q_host_rank(spark, sf_dir):
    """Host-granularity PageRank over the (weighted, via duplicate
    edges) host link graph — the Common-Crawl-style host selection
    signal. Hosts are ~5 orders fewer than URLs, so this is the rank
    that is actually affordable to iterate at 100 TB."""
    from warctools_spark.operators.frontier import link_rank
    from warctools_spark.sources.pages import host_expr

    docs = _docs(spark, sf_dir)
    n = docs.count()
    edges = (
        docs.select(
            F.col("doc_id").alias("s"),
            F.explode(F.sequence(F.lit(0), F.lit(7))).alias("i"),
        )
        .select(
            host_expr(F.col("s")).alias("src"),
            host_expr((F.col("s") * 31 + F.col("i") * 97 + 7) % n).alias(
                "dst"
            ),
        )
    )
    vertices = docs.select(host_expr(F.col("doc_id")).alias("node")).distinct()
    ranks = link_rank(edges, vertices, iterations=2, id_col="node")
    return ranks.select(
        F.col("node").alias("host"), F.round("rank", 6).alias("rank")
    )


def _q_politeness_budgeted(spark, sf_dir):
    """Crawl-delay budget windows (robots Crawl-delay semantics): a
    host allows min(k, epoch_ms/crawl_delay) fetches per epoch. The
    delay is derived deterministically from the host's md5 so the
    oracle can replay the budget arithmetic."""
    from warctools_spark.operators.frontier import (
        politeness_schedule_budgeted,
    )

    cand = _candidates(spark, sf_dir)
    delay = 100 * (
        1
        + F.pmod(
            F.conv(F.substring(F.md5("host"), 1, 2), 16, 10).cast("int"),
            F.lit(40),
        )
    )
    queued = cand.withColumn("crawl_delay_ms", delay)
    return politeness_schedule_budgeted(queued, 8, epoch_ms=3000).select(
        "host", "canon_url"
    )


def _q_tpch_q5ish(spark, sf_dir):
    """Q5-style multi-join: revenue per nation for one region — six
    tables, dims broadcast, one agg shuffle. TPC-H Q5 drops the
    c_nationkey = s_nationkey clause (the synthetic corpus has no
    aligned customer/supplier nations)."""
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def _q_events_sessionize(spark, sf_dir):
    """Stateful sessionization via gap>30min window — the batch
    equivalent of the streaming session operator."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Microsecond precision: events.parquet timestamps carry non-zero
    # micros, and truncating to whole seconds flips gap>30min on boundary
    # rows (diverges from the fractional-epoch oracle).
    epoch_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = epoch_us - F.lag(epoch_us).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0),
    )
    # Explicit BIGINT on both sides: DuckDB promotes windowed SUM(INTEGER)
    # to HUGEINT, which a type-tagging driver hash normalizes differently
    # from Spark's BIGINT even when values agree.
    return flagged.withColumn(
        "session_seq",
        F.sum("new_session")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .cast("long"),
    ).select("event_id", "user_id", "session_seq")


def _q_events_hourly(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "hour"
        ),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 3).alias("sum_value"),
    )


# ---- rows-only (kernel/binary semantics DuckDB cannot express) ----

def _q_frontier_epoch(spark, sf_dir):
    """Full epoch incl. politeness + state update (flagship plan)."""
    from warctools_spark.plans.epoch import init_state, run_epoch
    from warctools_spark.sources.pages import url_for

    pages = _pages(spark, sf_dir)
    n = _docs(spark, sf_dir).count()
    seeds = spark.createDataFrame(
        [(url_for(i),) for i in range(0, n, 7)], "url string"
    )
    queue, seen = init_state(seeds)
    res = run_epoch(spark, pages, queue, seen, epoch=0, k_per_host=10)
    return res.schedule.select("canon_url", "host", "depth")


def _q_bloom_dedup(spark, sf_dir):
    """Two-tier Bloom+exact dedup; must equal the exact anti-join
    (returns both counts for the record)."""
    from warctools_spark.operators.seen import two_tier_dedup

    cand = _candidates(spark, sf_dir)
    n = _docs(spark, sf_dir).count()
    from warctools_spark.functions.udfs import udf_url_sha1
    from warctools_spark.sources.pages import url_expr

    seen_ids = spark.range(0, n, 2).select(
        udf_url_sha1(url_expr(F.col("id"))).alias("url_sha1")
    )
    exact = cand.join(seen_ids, "url_sha1", "left_anti")
    two = two_tier_dedup(spark, cand, seen_ids, n_buckets=8)
    return spark.createDataFrame(
        [(exact.count(), two.count())], "exact_count long, two_tier_count long"
    )


def _q_warc_roundtrip(spark, sf_dir):
    """pages -> WARC serialization -> reparse -> invariants: exercises
    udf_write_warc + the parse kernel through Spark (warc2warc
    semantics, warc.py:76-127). Deterministic doc_id<200 slice and
    boolean invariants (url fidelity, content-length fidelity, zero
    parse errors) so a pure-SQL oracle can replay the expected rows
    from the document model."""
    from warctools_spark.functions.udfs import udf_write_warc
    from warctools_spark.kernels.warc_parse import parse_archive

    import pandas as pd

    pages = _pages(spark, sf_dir).withColumn(
        "doc_id",
        F.regexp_extract("url", r"/doc/(\d+)\.html", 1).cast("long"),
    ).where(F.col("doc_id") < 200)
    recs = pages.select(
        udf_write_warc(
            F.concat(F.lit("<urn:uuid:"), F.md5("url"), F.lit(">")),
            F.lit("response"),
            F.col("url"),
            F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"),
            F.lit("application/http;msgtype=response"),
            F.col("html"),
            F.lit(False),
        ).alias("record_bytes"),
        "url",
        F.length("html").alias("payload_len"),
    )

    def reparse(batches):
        for pdf in batches:
            out = []
            for rb, url, plen in zip(
                pdf["record_bytes"], pdf["url"], pdf["payload_len"]
            ):
                rows = parse_archive(bytes(rb), fmt="warc")
                for r in rows:
                    out.append(
                        {
                            "url": r.url.decode() if r.url else None,
                            "matches": (r.url or b"").decode() == url,
                            "clen_match": r.content_length == int(plen),
                            "n_errors": len(r.errors),
                        }
                    )
            yield pd.DataFrame(
                out, columns=["url", "matches", "clen_match", "n_errors"]
            )

    return recs.mapInPandas(
        reparse, "url string, matches boolean, clen_match boolean, n_errors int"
    )



def _q_lsh_band_buckets(spark, sf_dir):
    """MinHash LSH banding: (doc_id, band, band_key) — the bucket keys
    that drive candidate generation, fully oracle-replayable."""
    from warctools_spark.operators.dedup import minhash_signature

    docs = _docs(spark, sf_dir)
    sig = docs.select("doc_id", minhash_signature(F.col("text"), 8).alias("sig"))
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "-",
                            F.col("sig")[b * 2].cast("string"),
                            F.col("sig")[b * 2 + 1].cast("string"),
                        ).alias("band_key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))


def _q_dedup_clusters(spark, sf_dir):
    """LSH candidate pairs -> connected components: (doc_id,
    cluster_id=min reachable id). Star-capping in the pair generator
    does not change connectivity, so the oracle replays plain all-pairs
    closure with a recursive CTE."""
    from warctools_spark.operators.dedup import (
        dup_clusters,
        minhash_lsh_candidates,
    )

    docs = _docs(spark, sf_dir)
    pairs = minhash_lsh_candidates(docs, num_hashes=8, bands=4)
    return dup_clusters(pairs, docs)


def _q_training_corpus(spark, sf_dir):
    """The composed corpus-preparation pipeline end-to-end: quality
    gate -> language gate -> exact dedup -> LSH near-dup survivors,
    every stage oracle-replayable."""
    from warctools_spark.plans.corpus import prepare_training_corpus

    return prepare_training_corpus(_docs(spark, sf_dir))


def _q_dedup_survivors(spark, sf_dir):
    """The full near-dup pipeline as one query: MinHash LSH candidate
    pairs -> exact n-gram Jaccard verify (>= 0.8) -> connected
    components -> keep the min id per cluster. This is the
    keep-one-copy projection a training-data pipeline feeds the
    tokenizer. (Star-capped pairs could in principle verify
    differently from all-pairs on degenerate corpora; no bucket
    exceeds the cap at oracle scale.)"""
    from warctools_spark.operators.dedup import (
        dup_clusters,
        minhash_lsh_candidates,
        ngram_jaccard,
    )

    docs = _docs(spark, sf_dir)
    pairs = minhash_lsh_candidates(docs, num_hashes=8, bands=4)
    verified = (
        ngram_jaccard(docs, pairs)
        .where(F.col("jaccard") >= 0.8)
        .select("id_a", "id_b")
    )
    clusters = dup_clusters(verified, docs)
    return clusters.where(F.col("doc_id") == F.col("cluster_id")).select(
        "doc_id"
    )


def _q_hyperplane_bands(spark, sf_dir):
    """Banded random-hyperplane LSH keys over the embedding corpus —
    the bucket keys driving embedding_cosine_pairs, fully replayable
    (deterministic md5-parity ±1 hyperplanes inlined as constants on
    both sides)."""
    from warctools_spark.operators.dedup import hyperplane_band_keys

    emb = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return emb.select(
        "vec_id",
        F.explode(hyperplane_band_keys("v", bands=4, bits_per_band=8, dims=64)).alias(
            "bk"
        ),
    ).select(
        "vec_id",
        F.col("bk.band").alias("band"),
        F.col("bk.band_key").alias("band_key"),
    )


def _q_image_features(spark, sf_dir):
    """Multimodal plumbing: fake-codec decode + pixel stats, checked
    against an oracle that recomputes the quantization in SQL."""
    from warctools_spark.operators.multimodal import image_features, synthesize_media

    media = synthesize_media(spark, sf_dir)
    feats = image_features(media)
    return feats.select(
        "media_id",
        F.round(F.col("features")[0], 6).alias("px_mean"),
        F.round(F.col("features")[1], 6).alias("px_std"),
        F.round(F.col("features")[2], 6).alias("hist0"),
    )


def _q_unpack_paths(spark, sf_dir):
    """warcunpack output-path projection over 2xx html pages
    (warcunpack_ia.py:168-215 sanitize semantics)."""
    from warctools_spark.functions.udfs import udf_decode_http
    from warctools_spark.operators.unpack import udf_sanitize_path

    pages = _pages(spark, sf_dir)
    h = udf_decode_http("html")
    return (
        pages.withColumn("code", h["code"]).withColumn("mime", h["mime"])
        .where((F.col("code") >= 200) & (F.col("code") < 300))
        .select("url", udf_sanitize_path("url", "mime").alias("out_path"))
    )


def _q_cuckoo_dedup(spark, sf_dir):
    """Cuckoo-filter two-tier dedup == exact anti-join (delete-capable
    seen-set fallback)."""
    from warctools_spark.operators.cuckoo import two_tier_dedup_cuckoo
    from warctools_spark.functions.udfs import udf_url_sha1
    from warctools_spark.sources.pages import url_expr

    cand = _candidates(spark, sf_dir)
    n = _docs(spark, sf_dir).count()
    seen_ids = spark.range(0, n, 2).select(
        udf_url_sha1(url_expr(F.col("id"))).alias("url_sha1")
    )
    exact = cand.join(seen_ids, "url_sha1", "left_anti")
    two = two_tier_dedup_cuckoo(spark, cand, seen_ids, n_buckets=8)
    return spark.createDataFrame(
        [(exact.count(), two.count())], "exact_count long, cuckoo_count long"
    )


def _q_kmeans(spark, sf_dir):
    """SemDeDup-style deterministic k-means assignment over the
    embeddings table (k=8, 2 Lloyd iterations, id-init centroids)."""
    from warctools_spark.operators.similarity import kmeans_assign

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return kmeans_assign(emb, k=8, iterations=2)


def _q_duplicate_spans(spark, sf_dir):
    """Lee-et-al-style exact substring duplication: merged >=15-token
    spans of duplicated 10-grams (corpus-wide first occurrence
    exempt)."""
    from warctools_spark.operators.dedup import duplicate_spans

    return duplicate_spans(_docs(spark, sf_dir), k=10, min_span_tokens=15)


def _q_remove_duplicate_spans(spark, sf_dir):
    """Substring-dedup rewrite: documents with their duplicated spans
    cut out (first occurrence survives)."""
    from warctools_spark.operators.dedup import remove_duplicate_spans

    return remove_duplicate_spans(
        _docs(spark, sf_dir), k=10, min_span_tokens=15
    )


def _q_rag_corpus(spark, sf_dir):
    """Composed RAG pipeline: substring-dedup rewrite -> sliding-
    window chunking of the cleaned text -> min-size chunk gate."""
    from warctools_spark.plans.corpus import rag_corpus

    return rag_corpus(
        _docs(spark, sf_dir),
        k=10,
        min_span_tokens=15,
        window=64,
        stride=32,
        min_chunk_tokens=8,
    )


def _q_length_report(spark, sf_dir):
    """Token-length distribution report (count/total/mean/min/max +
    interpolated p25/p50/p75/p95) — the pre-filtering sanity check."""
    from warctools_spark.operators.text_analysis import length_report

    return length_report(_docs(spark, sf_dir))


_MODEL_FEATS = ["n_tokens", "n_punct", "n_stopwords_en", "n_distinct_tokens"]


def _q_quality_model_moments(spark, sf_dir):
    """The distributed half of quality-classifier training: exact
    integer Gram moments (X'X, X'y) over the quality features with
    label = (lang == 'en') — ONE map-side-combinable aggregate; the
    (k+1)x(k+1) ridge solve is driver math (unit-tested vs numpy)."""
    from warctools_spark.operators.modeling import gram_moments
    from warctools_spark.operators.text_analysis import quality_features

    docs = _docs(spark, sf_dir)
    feats = quality_features(docs).withColumn(
        "is_en", (F.col("lang") == "en").cast("int")
    )
    return gram_moments(feats, _MODEL_FEATS, "is_en")


def _q_corpus_drift(spark, sf_dir):
    """Snapshot drift report: even-id docs vs odd-id docs — token
    totals, vocab overlap, add-1-smoothed KL(A||B)."""
    from warctools_spark.operators.text_analysis import corpus_drift

    docs = _docs(spark, sf_dir)
    return corpus_drift(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
    )


def _q_chunk_documents(spark, sf_dir):
    """Sliding-window token chunking (window=64, stride=32) — RAG /
    context-window prep, pure Catalyst sequence+slice+explode."""
    from warctools_spark.operators.text_analysis import chunk_documents

    return chunk_documents(_docs(spark, sf_dir), window=64, stride=32)


def _q_semdedup(spark, sf_dir):
    """SemDeDup survivors: cluster embeddings (k=8), drop any vector
    whose cell has a lower-id vector at cosine >= 0.5 (the corpus's
    vectors are well-spread, so the threshold sits where the drop
    branch actually fires)."""
    from warctools_spark.operators.similarity import semdedup_survivors

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return semdedup_survivors(emb, k=8, iterations=2, threshold=0.5)


def _q_inverted_index(spark, sf_dir):
    """FLAT positional inverted index (term -> ordered doc:pos
    postings + df), restricted to terms in >= 5 docs. segment_size=
    None pins the one-row-per-term variant this oracle describes; the
    library DEFAULT (inverted_index with no args) is the skew-proof
    segmented build, certified by the inverted_index_segmented
    entry."""
    from warctools_spark.operators.text_analysis import inverted_index

    return inverted_index(_docs(spark, sf_dir), min_df=5, segment_size=None)


def _q_inverted_index_segmented(spark, sf_dir):
    """Skew-proof inverted index: hot terms split into hash-assigned
    segments of <= ~40 postings (segment keys are map-side
    expressions — no rank window, so no term can serialize a task)."""
    from warctools_spark.operators.text_analysis import (
        inverted_index_segmented,
    )

    return inverted_index_segmented(
        _docs(spark, sf_dir), segment_size=40, min_df=5
    )


def _q_unigram_logprob(spark, sf_dir):
    """CCNet-style fluency proxy: per-doc mean -ln p(token) under the
    corpus unigram model."""
    from warctools_spark.operators.text_analysis import unigram_logprob

    return unigram_logprob(_docs(spark, sf_dir))


def _q_tfidf_keywords(spark, sf_dir):
    """Per-document top-3 TF-IDF keywords: the classic crawl-corpus
    relevance/indexing signal (doc-term agg -> vocab df agg -> join ->
    WindowGroupLimit top-k)."""
    from warctools_spark.operators.text_analysis import tfidf_keywords

    return tfidf_keywords(_docs(spark, sf_dir), k=3)


def _q_split_assign(spark, sf_dir):
    """Deterministic train/val/test assignment (90/5/5) — pure
    map-side hash-interval expression, so a re-computed partition can
    never move an example between train and test."""
    from warctools_spark.operators.sampling import split_assign

    return split_assign(_docs(spark, sf_dir)).select("doc_id", "split")


def _q_bpe_pair_counts(spark, sf_dir):
    """Top-200 adjacent-character-pair counts inside words — the
    counting step of a BPE tokenizer-training merge round."""
    from warctools_spark.operators.text_analysis import bpe_pair_counts

    return bpe_pair_counts(_docs(spark, sf_dir), top_n=200)


def _q_winnow_fingerprints(spark, sf_dir):
    """Winnowing fingerprints (MOSS algorithm): per-window min k-gram
    hash with rightmost tie-break — every shared substring of length
    >= k+w-1 is guaranteed a shared fingerprint."""
    from warctools_spark.operators.text_analysis import winnow_fingerprints

    return winnow_fingerprints(_docs(spark, sf_dir), k=8, w=4)


def _q_winnow_match_scores(spark, sf_dir):
    """MOSS-style copy/quote candidate pairs: docs sharing >= 3
    winnowing fingerprints (df-gated self-join), scored by the count
    of distinct shared fingerprints."""
    from warctools_spark.operators.text_analysis import winnow_match_scores

    return winnow_match_scores(
        _docs(spark, sf_dir), k=8, w=4, min_shared=3, max_doc_freq=100
    )


def _q_bigram_logprob(spark, sf_dir):
    """Per-doc mean bigram conditional negative log-prob under the
    corpus's own bigram model — the order-sensitive fluency proxy."""
    from warctools_spark.operators.text_analysis import bigram_logprob

    return bigram_logprob(_docs(spark, sf_dir))


def _q_ngram_containment(spark, sf_dir):
    """Asymmetric 3-gram containment (+jaccard) for consecutive-id
    pairs — the quote/partial-copy detector Jaccard misses."""
    from warctools_spark.operators.dedup import ngram_containment

    docs = _docs(spark, sf_dir)
    pairs = docs.select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")
    )
    return ngram_containment(docs, pairs)


def _q_ivf_kmeans_topk(spark, sf_dir):
    """ANN top-k over a kmeans-trained IVF index: probe the 2 nearest
    of 8 Lloyd cells, exact-rerank inside them. The oracle replays the
    full pipeline — training (shared kmeans CTE), assignment, probe
    selection, cosine rerank."""
    from warctools_spark.operators.similarity import ivf_kmeans_topk

    emb = _emb(spark, sf_dir)
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return ivf_kmeans_topk(
        emb, [float(v) for v in qvec], k=10, n_cells=8, iterations=2,
        n_probe=2,
    )



def _q_dsir_weights(spark, sf_dir):
    """DSIR data-selection scoring (Xie et al. 2023): hashed
    unigram+bigram importance log-weights of every doc against the
    lang='en' subset as the target distribution."""
    from warctools_spark.operators.sampling import dsir_weights

    docs = _docs(spark, sf_dir)
    # target is a subset of docs -> the predicate path tokenizes and
    # hashes each doc ONCE (the two-DataFrame path would hash every
    # en doc twice)
    return dsir_weights(docs, target_predicate="lang = 'en'")


def _q_dsir_select(spark, sf_dir):
    """DSIR selection stage: deterministic Gumbel-top-k importance
    resampling — the 100 docs a DSIR pass would keep."""
    from warctools_spark.operators.sampling import dsir_select

    docs = _docs(spark, sf_dir)
    return dsir_select(docs, k=100, target_predicate="lang = 'en'")


def _q_ccnet_buckets(spark, sf_dir):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): corpus
    split into exact head/middle/tail thirds by unigram fluency."""
    from warctools_spark.operators.text_analysis import ccnet_buckets

    return ccnet_buckets(_docs(spark, sf_dir))


def _q_cms_top_tokens(spark, sf_dir):
    """Count-min-sketch heavy hitters: top-20 tokens by sketch
    estimate with the exact count alongside as the overestimate
    audit (constant-memory mergeable corpus statistics)."""
    from warctools_spark.operators.sketches import cms_top_tokens

    return cms_top_tokens(_docs(spark, sf_dir))


def _q_hll_vocab(spark, sf_dir):
    """Deterministic HyperLogLog estimate of the corpus vocabulary
    size (256 registers, md5-parity hash), with exact distinct count
    and relative error alongside."""
    from warctools_spark.operators.sketches import hll_distinct

    toks = _docs(spark, sf_dir).select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    ).where(F.col("token") != "")
    return hll_distinct(toks, "token")


def _q_ngram_novelty(spark, sf_dir):
    """Per-doc 5-gram novelty: fraction of a doc's shingles first
    seen in this doc (boilerplate/mirror detection signal)."""
    from warctools_spark.operators.text_analysis import ngram_novelty

    return ngram_novelty(_docs(spark, sf_dir))



def _q_host_quality_rollup(spark, sf_dir):
    """Per-host reputation rollup: doc count, mean quality score,
    language entropy — the host-level frontier prioritization
    signal (kill a spam farm at the host, not per URL)."""
    from warctools_spark.operators.text_analysis import host_quality_rollup
    from warctools_spark.sources.pages import host_expr

    docs = _docs(spark, sf_dir).withColumn("host", host_expr(F.col("doc_id")))
    return host_quality_rollup(docs)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDERING IS DELIBERATE: the round driver records correctness for
    # the FIRST 50 entries only. Round-5 window discipline (r04 brief
    # #1): lead with everything whose implementation changed this round
    # (bigram_logprob join-back, ngram_containment guard, and the
    # kmeans/semdedup/ivf family over the refactored shared assignment
    # helper), then rotate in the 38 entries whose only driver
    # certification is CORRECTNESS_r03 — after this round the r04+r05
    # union covers all 88 queries with nothing certified older than
    # two rounds. The tail is entirely r04-certified, unchanged since,
    # and re-verified locally each round via tools/check_oracles.py.
    return {
        # --- NEW in round 5 (widening): must be in-window ---
        "dsir_weights": _q_dsir_weights,
        "dsir_select": _q_dsir_select,
        "ccnet_buckets": _q_ccnet_buckets,
        "cms_top_tokens": _q_cms_top_tokens,
        "hll_vocab": _q_hll_vocab,
        "ngram_novelty": _q_ngram_novelty,
        "host_quality_rollup": _q_host_quality_rollup,
        # --- changed in round 5: re-certify first ---
        "bigram_logprob": _q_bigram_logprob,
        "ngram_containment": _q_ngram_containment,
        "kmeans_assign": _q_kmeans,
        "semdedup": _q_semdedup,
        "ivf_kmeans_topk": _q_ivf_kmeans_topk,
        # --- certified only by r03: rotate into the 50-entry
        # driver window so the r04+r05 union covers all 88
        # with nothing older than two rounds ---
        "events_hourly": _q_events_hourly,
        "tpch_q3ish": _q_tpch_q3ish,
        "tpch_q5ish": _q_tpch_q5ish,
        "lsh_topk": _q_lsh_topk,
        "embedding_neardup": _q_embedding_neardup,
        "lsh_band_buckets": _q_lsh_band_buckets,
        "hyperplane_bands": _q_hyperplane_bands,
        "dedup_survivors": _q_dedup_survivors,
        "image_features": _q_image_features,
        "unpack_paths": _q_unpack_paths,
        "cuckoo_dedup": _q_cuckoo_dedup,
        "bloom_dedup": _q_bloom_dedup,
        "tfidf_keywords": _q_tfidf_keywords,
        "unigram_logprob": _q_unigram_logprob,
        "chunk_documents": _q_chunk_documents,
        "corpus_drift": _q_corpus_drift,
        "inverted_index_segmented": _q_inverted_index_segmented,
        "quality_model_moments": _q_quality_model_moments,
        "length_report": _q_length_report,
        "page_index": _q_page_index,
        "filter_url": _q_filter_url,
        "filter_body": _q_filter_body,
        "frontier_candidates": _q_frontier_candidates,
        "politeness_topk": _q_politeness_topk,
        "politeness_budgeted": _q_politeness_budgeted,
        "host_agg": _q_host_agg,
        "seen_antijoin": _q_seen_antijoin,
        "dedup_exact": _q_dedup_exact,
        "minhash_signature": _q_minhash,
        "ngram_jaccard": _q_jaccard,
        "simhash": _q_simhash,
        "training_corpus_v2": _q_training_corpus_v2,
        "anchor_texts": _q_anchor_texts,
        "pack_sequences": _q_pack_sequences,
        "remove_duplicate_spans": _q_remove_duplicate_spans,
        "duplicate_spans": _q_duplicate_spans,
        "training_corpus": _q_training_corpus,
        "dedup_clusters": _q_dedup_clusters,
        # --- r04-certified entries sharing round-5-touched
        # modules (text_analysis/similarity), re-certified as
        # defense in depth ---
        "bpe_pair_counts": _q_bpe_pair_counts,
        "token_frequencies": _q_token_frequencies,
        "winnow_fingerprints": _q_winnow_fingerprints,
        "winnow_match_scores": _q_winnow_match_scores,
        "inverted_index": _q_inverted_index,
        "embedding_topk": _q_embedding_topk,
        "events_sessionize": _q_events_sessionize,
        # --- past the driver's 50-entry window: every entry
        # below is driver-green in CORRECTNESS_r04.json,
        # unchanged since, and re-verified locally each round
        # via tools/check_oracles.py ---
        "split_assign": _q_split_assign,
        "decontaminate": _q_decontaminate,
        "repetition_features": _q_repetition,
        "segment_dedup": _q_segment_dedup,
        "gopher_gate": _q_gopher_gate,
        "stratified_sample": _q_stratified_sample,
        "fixed_n_sample": _q_fixed_n_sample,
        "lang_id": _q_lang_id,
        "token_counts": _q_token_counts,
        "quality_score": _q_quality,
        "scrub_pii": _q_scrub_pii,
        "main_content": _q_main_content,
        "skew_report": _q_skew_report,
        "corpus_mix": _q_corpus_mix,
        "filter_url_invert": _q_filter_url_invert,
        "link_rank": _q_link_rank,
        "politeness_topk_salted": _q_politeness_topk_salted,
        "dedup_exact_keep_first": _q_dedup_exact_keep_first,
        "doc_fingerprint": _q_fingerprint,
        "host_graph": _q_host_graph,
        "robots_sitemaps": _q_robots_sitemaps,
        "cdx_index": _q_cdx_index,
        "host_rank": _q_host_rank,
        "recrawl_priority": _q_recrawl_priority,
        "revisit_records": _q_revisit_records,
        "corpus_summary": _q_corpus_summary,
        "url_traps": _q_url_traps,
        "mime_sniff": _q_mime_sniff,
        "bigram_frequencies": _q_bigram_frequencies,
        "sitemap_seeds": _q_sitemap_seeds,
        "wet_records": _q_wet_records,
        "frontier_epoch": _q_frontier_epoch,
        "warc_roundtrip": _q_warc_roundtrip,
        "tpch_q1": _q_tpch_q1,
        "http_decode": _q_http_decode,
        "harvest_links": _q_harvest_links,
        "extract_text": _q_extract_text,
        "rag_corpus": _q_rag_corpus,
    }


# --------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------

# shared SQL fragments modeling the synthetic corpus
_HOST = (
    "CASE WHEN {id} % 10 < 3 THEN 'hot.example.com' "
    "ELSE 'src' || ({id} % 20) || '.example.com' END"
)
_URL = "'http://' || " + _HOST + " || '/doc/' || {id} || '.html'"

_NORM = "trim(regexp_replace(lower({c}), '\\s+', ' ', 'g'))"
_WORDS = "string_split(" + _NORM + ", ' ')"


def _hyperplane_bands_sql(bands: int = 4, bits: int = 8, dims: int = 64) -> str:
    """DuckDB replay of hyperplane_band_keys: the ±1 coefficients are
    the same md5-parity constants, inlined; each dot product is the
    same left-associated 64-term sum Spark's aggregate fold computes,
    so the float rounding (and hence every sign bit) is identical."""
    from warctools_spark.operators.dedup import _hyperplane

    def bit_expr(b, j):
        coefs = _hyperplane(b, j, dims)
        terms = " + ".join(
            f"({c:+.1f})*v[{d + 1}]" for d, c in enumerate(coefs)
        )
        return f"CASE WHEN ({terms}) >= 0 THEN '1' ELSE '0' END"

    def key_expr(b):
        return " || ".join(f"({bit_expr(b, j)})" for j in range(bits))

    entries = ",\n              ".join(
        "{'band': %d, 'band_key': %s}" % (b, key_expr(b)) for b in range(bands)
    )
    return f"""
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings)
            SELECT vec_id, t.b['band'] AS band, t.b['band_key'] AS band_key
            FROM e, UNNEST([
              {entries}
            ]) AS t(b)
        """


def _shingles_sql(c: str, n: int = 3) -> str:
    w = _WORDS.format(c=c)
    return (
        f"CASE WHEN len({w}) >= {n} THEN "
        f"list_distinct([array_to_string(({w})[i:i+{n - 1}], ' ') "
        f"for i in range(1, len({w}) - {n - 2})]) "
        f"ELSE [array_to_string({w}, ' ')] END"
    )


_LINKS_CTE = f"""
WITH nn AS (SELECT count(*) AS n FROM documents),
links AS (
  SELECT d.doc_id,
         {_URL.format(id="d.doc_id")} AS src_url,
         i,
         (d.doc_id * 31 + i * 97 + 7) % nn.n AS target
  FROM documents d CROSS JOIN nn CROSS JOIN range(0, {N_LINKS}) t(i)
)
"""


def _html_doc_sql() -> str:
    """Reconstruct sources/pages.py html_doc() in SQL."""
    target = "((d.doc_id * 31 + i * 97 + 7) % nn.n)"
    link_url = _URL.format(id=target)
    return (
        "'<html><head><title>Doc ' || d.doc_id || "
        "'</title></head><body><p>' || d.text || '</p>' || chr(10) || "
        f"array_to_string([('<a href=\"' || {link_url} || '\">link ' || i || "
        f"'</a>' || chr(10)) for i in range(0, {N_LINKS})], '') || "
        "'</body></html>'"
    )


_CAND_CTE = (
    _LINKS_CTE
    + f""",
cand AS (
  SELECT {_URL.format(id="target")} AS canon_url,
         {_HOST.format(id="target")} AS host,
         min(src_url) AS src_url
  FROM links
  WHERE target % {SEEN_MOD} <> 0
  GROUP BY target
)
"""
)


# deterministic Lloyd k-means over the embeddings table (k=8, init =
# vec_id 0..7, one round-6 centroid update); ends at d2t(vec_id,
# cluster, d2) = squared distance to every updated centroid
# winnowing fingerprints (k=8, w=4): per-window struct min =
# (hash, rightmost pos), encoded as 'h:pos' strings because
# list_distinct over structs is unsupported; shared by the
# winnow_fingerprints and winnow_match_scores oracles
_WINNOW_CTE = """
            WITH d AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
                         AS s
              FROM documents
            ),
            g AS (
              SELECT doc_id,
                     list_transform(range(1, length(s) - 8 + 2),
                       i -> {'h': md5(substr(s, i, 8)),
                             'negpos': -i}) AS grams
              FROM d WHERE length(s) >= 8
            ),
            sel AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       list_transform(
                         range(1, greatest(len(grams) - 3, 1) + 1),
                         j -> list_min(list_slice(grams, j, j + 3))),
                       m -> m.h || ':'
                            || CAST(-m.negpos AS VARCHAR))) AS fps
              FROM g
            )
"""


_KMEANS_CTE = """
            WITH e AS (
              SELECT vec_id,
                     list_transform(embedding,
                                    x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings
            ),
            -- clusters are numbered 0..k-1 by RANK of vec_id (not the
            -- raw id), matching kmeans_assign's enumeration of the k
            -- lowest-id vectors on ANY id space, contiguous or not
            c0 AS (
              SELECT CAST(rn - 1 AS INT) AS cluster, v AS c FROM (
                SELECT v, row_number() OVER (ORDER BY vec_id) AS rn
                FROM e
              ) WHERE rn <= 8
            ),
            d1 AS (
              SELECT e.vec_id, c0.cluster,
                     list_sum(list_transform(list_zip(e.v, c0.c),
                              p -> (p[1]-p[2])*(p[1]-p[2]))) AS d2
              FROM e CROSS JOIN c0
            ),
            m1 AS (
              SELECT vec_id, cluster FROM (
                SELECT vec_id, cluster, row_number() OVER (
                  PARTITION BY vec_id ORDER BY d2, cluster) AS rn
                FROM d1) WHERE rn = 1
            ),
            dims AS (
              SELECT e.vec_id, unnest(e.v) AS val,
                     generate_subscripts(e.v, 1) - 1 AS dim
              FROM e
            ),
            upd AS (
              SELECT m1.cluster, dims.dim, round(avg(dims.val), 6) AS val
              FROM dims JOIN m1 USING (vec_id)
              GROUP BY m1.cluster, dims.dim
            ),
            c1u AS (
              SELECT cluster, list(val ORDER BY dim) AS c
              FROM upd GROUP BY cluster
            ),
            -- a cluster that emptied in round 1 keeps its round-0
            -- centroid (matches kmeans_assign's stale-centroid rule)
            c1 AS (
              SELECT c0.cluster, coalesce(c1u.c, c0.c) AS c
              FROM c0 LEFT JOIN c1u USING (cluster)
            ),
            d2t AS (
              SELECT e.vec_id, c1.cluster,
                     list_sum(list_transform(list_zip(e.v, c1.c),
                              p -> (p[1]-p[2])*(p[1]-p[2]))) AS d2
              FROM e CROSS JOIN c1
            )
"""


# duplicated-10-gram spans (gaps-and-islands over non-first k-gram
# occurrences); ends at spans(doc_id, span_start, span_end, n_tokens)
# with min_span_tokens=15
_SPANS_CTE = """
            WITH d AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(text), '\\s+') AS t
              FROM documents
            ),
            idx AS (
              SELECT doc_id, t, unnest(range(1, len(t) - 10 + 2)) AS i
              FROM d WHERE len(t) >= 10
            ),
            g AS (
              SELECT doc_id, CAST(i AS INT) - 1 AS pos,
                     array_to_string(t[i:i+9], ' ') AS gram
              FROM idx
            ),
            dup AS (
              SELECT doc_id, pos FROM (
                SELECT doc_id, pos, row_number() OVER (
                  PARTITION BY gram ORDER BY doc_id, pos) AS rn
                FROM g) WHERE rn > 1
            ),
            marked AS (
              SELECT doc_id, pos,
                     max(pos + 10) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ) AS prev_end
              FROM dup
            ),
            isl AS (
              SELECT doc_id, pos,
                     sum(CASE WHEN prev_end IS NULL OR pos > prev_end
                              THEN 1 ELSE 0 END) OVER (
                       PARTITION BY doc_id ORDER BY pos) AS island
              FROM marked
            ),
            spans AS (
              SELECT doc_id, min(pos) AS span_start,
                     max(pos) + 10 AS span_end,
                     max(pos) + 10 - min(pos) AS n_tokens
              FROM isl GROUP BY doc_id, island
              HAVING max(pos) + 10 - min(pos) >= 15
            )
"""


def _quality_model_moments_sql() -> str:
    """Exact integer Gram moments over the quality features with the
    (lang='en') label — generated to mirror modeling.gram_moments's
    s_i / m_i_j naming for any feature count."""
    cols = [
        "n_tokens",
        "n_punct",
        "n_stop",
        "n_distinct_tokens",
        "is_en",
    ]
    parts = ["count(*) AS n"]
    for i, a in enumerate(cols):
        parts.append(f"CAST(sum({a}) AS BIGINT) AS s_{i}")
        for j, b in enumerate(cols[i:], start=i):
            parts.append(f"CAST(sum({a} * {b}) AS BIGINT) AS m_{i}_{j}")
    return (
        "SELECT "
        + ", ".join(parts)
        + """
            FROM (
              SELECT
                CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                END AS n_tokens,
                len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
                len(list_filter(regexp_split_to_array(trim(lower(text)),
                                                      '\\s+'),
                    t -> list_contains(['the','and','of','to','a','in','is',
                                        'that'], t))) AS n_stop,
                len(list_distinct(regexp_split_to_array(trim(text), '\\s+')))
                    AS n_distinct_tokens,
                CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en
              FROM documents
            )
        """
    )


def _lang_sql() -> str:
    from warctools_spark.operators.text_analysis import LANG_STOPWORDS

    toks = "regexp_split_to_array(trim(lower(text)), '\\s+')"
    hit = (
        lambda code: "len(list_filter("
        + toks
        + ", t -> list_contains(["
        + ",".join("'%s'" % w for w in LANG_STOPWORDS[code])
        + "], t)))"
    )
    # replicate the fold in lang_id(): strict > over sorted codes
    best, score = "'und'", "0"
    for code in sorted(LANG_STOPWORDS):
        h = hit(code)
        best = f"CASE WHEN {h} > {score} THEN '{code}' ELSE {best} END"
        score = f"CASE WHEN {h} > {score} THEN {h} ELSE {score} END"
    return best



_DSIR_WTS_CTE = """
WITH w0 AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(trim(text), '\\s+'),
                     x -> x <> '') AS w
  FROM documents
),
g AS (
  SELECT doc_id, lang, unnest(w) AS gram FROM w0
  UNION ALL
  SELECT doc_id, lang, w[i] || ' ' || w[i + 1] AS gram
  FROM (SELECT doc_id, lang, w, unnest(range(1, len(w))) AS i
        FROM w0 WHERE len(w) >= 2)
),
db AS (
  SELECT doc_id, lang,
         (CAST(('0x' || substr(md5('dsir-v1:' || gram), 1, 15)) AS BIGINT)
          % 4096) AS bucket,
         CAST(count(*) AS BIGINT) AS c
  FROM g GROUP BY 1, 2, 3
),
q AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS qn FROM db GROUP BY bucket),
p AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS pn FROM db
      WHERE lang = 'en' GROUP BY bucket),
tot AS (SELECT (SELECT CAST(sum(pn) AS DOUBLE) FROM p) AS pp,
               (SELECT CAST(sum(qn) AS DOUBLE) FROM q) AS qq),
lam AS (
  SELECT d.bucket,
         ln((coalesce(pn, 0) + 1.0) / (pp + 4096.0))
         - ln((coalesce(qn, 0) + 1.0) / (qq + 4096.0)) AS lam
  FROM (SELECT unnest(range(0, 4096)) AS bucket) d
  LEFT JOIN p ON d.bucket = p.bucket
  LEFT JOIN q ON d.bucket = q.bucket
  CROSS JOIN tot
),
wts AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
         round(sum(c * lam), 4) AS log_weight
  FROM db JOIN lam USING (bucket) GROUP BY doc_id
),
allw AS (
  SELECT d.doc_id,
         coalesce(n_grams, 0) AS n_grams,
         coalesce(log_weight, 0.0) AS log_weight
  FROM documents d LEFT JOIN wts ON d.doc_id = wts.doc_id
)
"""

_HLL_EST = """(CASE WHEN (0.7213 / (1.0 + 1.079 / 256)) * 256 * 256 / Z
                         <= 2.5 * 256 AND V > 0
              THEN 256.0 * ln(256.0 / V)
              ELSE (0.7213 / (1.0 + 1.079 / 256)) * 256 * 256 / Z END)"""


def oracle_sql() -> dict[str, str]:
    """ANSI-SQL DuckDB twins of every queries() entry. BEFORE adding
    or editing an oracle, walk the ORACLES.md checklist (HUGEINT
    widening, bucket-column drop, array-lambda inlining, name-sorted
    hash compare, fold-order rounding, regex dialects, ...) — each
    entry there cost a round of debugging once already."""
    sh = _shingles_sql("text")
    html_doc = _html_doc_sql()
    p = 2147483647
    minhash_cols = ", ".join(
        "list_min([(h * %d + %d) %% %d for h in hs])"
        % (1000003 + 37 * i, 777767777 + 101 * i, p)
        for i in range(8)
    )
    lang_expr = _lang_sql()

    return {
        "host_quality_rollup": f"""
            WITH q AS (
              SELECT {_HOST.format(id="doc_id")} AS host, lang,
                     round(least(n_tokens, 100) * 0.3
                           + (n_distinct_tokens / greatest(n_tokens, 1)) * 30
                           + (n_stop / greatest(n_tokens, 1)) * 100 * 0.2
                           + (1 - least((n_punct / greatest(n_chars2, 1)) * 5,
                                        1.0)) * 20, 4) AS quality_score
              FROM (
                SELECT doc_id, lang,
                  CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                  END AS n_tokens,
                  len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
                  len(list_distinct(regexp_split_to_array(trim(text),
                                                          '\\s+')))
                      AS n_distinct_tokens,
                  len(list_filter(regexp_split_to_array(trim(lower(text)),
                                                        '\\s+'),
                      t -> list_contains(['the','and','of','to','a','in','is',
                                          'that'], t))) AS n_stop,
                  length(text) AS n_chars2
                FROM documents
              )
            ),
            roll AS (
              SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
                     round(avg(quality_score), 4) AS mean_quality
              FROM q GROUP BY host
            ),
            hl AS (
              SELECT host, lang, CAST(count(*) AS BIGINT) AS c
              FROM q GROUP BY host, lang
            ),
            ent AS (
              SELECT host, CAST(count(*) AS BIGINT) AS n_langs,
                     round(ln(CAST(sum(c) AS DOUBLE))
                           - sum(c * ln(CAST(c AS DOUBLE)))
                             / sum(c), 4) AS lang_entropy
              FROM hl GROUP BY host
            )
            SELECT host, n_docs, mean_quality, n_langs, lang_entropy
            FROM roll JOIN ent USING (host)
        """,
        "dsir_weights": _DSIR_WTS_CTE + """
            SELECT doc_id, n_grams, log_weight FROM allw
        """,
        "dsir_select": _DSIR_WTS_CTE + """
            SELECT doc_id, n_grams, log_weight,
                   round(log_weight
                         - ln(-ln(((CAST(('0x' || substr(md5('dsir-v1-gumbel:'
                                   || CAST(doc_id AS VARCHAR)), 1, 15))
                                   AS BIGINT) % 1000000) + 0.5)
                                  / 1000000.0)), 4) AS dsir_score
            FROM allw
            ORDER BY dsir_score DESC, doc_id ASC LIMIT 100
        """,
        "ccnet_buckets": """
            WITH tk AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\\s+'))
                         AS token
              FROM documents
            ),
            tk2 AS (SELECT * FROM tk WHERE token <> ''),
            freq AS (SELECT token, count(*) AS n FROM tk2 GROUP BY token),
            tt AS (SELECT count(*) AS t FROM tk2),
            s AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                     round(avg(-ln(n / CAST(t AS DOUBLE))), 4)
                         AS mean_neg_logprob
              FROM tk2 JOIN freq USING (token) CROSS JOIN tt
              GROUP BY doc_id
            ),
            sc AS (SELECT mean_neg_logprob, CAST(count(*) AS BIGINT) AS cnt
                   FROM s GROUP BY mean_neg_logprob),
            cum AS (
              SELECT mean_neg_logprob,
                     CAST(sum(cnt) OVER (ORDER BY mean_neg_logprob
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS BIGINT) AS cum,
                     (SELECT CAST(sum(cnt) AS BIGINT) FROM sc) AS n
              FROM sc
            ),
            b AS (
              SELECT mean_neg_logprob,
                     CASE WHEN cum * 3 <= n THEN 'head'
                          WHEN cum * 3 <= n * 2 THEN 'middle'
                          ELSE 'tail' END AS ppl_bucket
              FROM cum
            )
            SELECT doc_id, n_tokens, mean_neg_logprob, ppl_bucket
            FROM s JOIN b USING (mean_neg_logprob)
        """,
        "cms_top_tokens": """
            WITH tk AS (
              SELECT unnest(regexp_split_to_array(trim(text), '\\s+'))
                  AS token
              FROM documents
            ),
            freq AS (SELECT token, CAST(count(*) AS BIGINT) AS n_exact
                     FROM tk WHERE token <> '' GROUP BY token),
            hashed AS (
              SELECT token, n_exact, j,
                     (CAST(('0x' || substr(md5('cms-v1:'
                           || CAST(j AS VARCHAR) || ':' || token), 1, 15))
                           AS BIGINT) % 1024) AS bucket
              FROM freq CROSS JOIN (SELECT unnest(range(0, 4)) AS j)
            ),
            counters AS (SELECT j, bucket, CAST(sum(n_exact) AS BIGINT) AS cnt
                         FROM hashed GROUP BY j, bucket)
            SELECT token, n_exact, n_cms FROM (
              SELECT token, min(n_exact) AS n_exact,
                     CAST(min(cnt) AS BIGINT) AS n_cms
              FROM hashed JOIN counters USING (j, bucket)
              GROUP BY token
            ) ORDER BY n_cms DESC, token ASC LIMIT 20
        """,
        "hll_vocab": f"""
            WITH tk AS (
              SELECT unnest(regexp_split_to_array(trim(text), '\\s+'))
                  AS token
              FROM documents
            ),
            tk2 AS (SELECT token FROM tk WHERE token <> ''),
            h AS (
              SELECT CAST(('0x' || substr(md5('hll-v1:' || token), 1, 15))
                          AS BIGINT) AS h
              FROM tk2
            ),
            reg AS (SELECT h % 256 AS idx, min(h // 256) AS minv
                    FROM h GROUP BY idx),
            bl AS (
              SELECT idx, minv,
                     CASE WHEN minv = 0 THEN 53
                          ELSE 53 - (max(k) + 1) END AS M
              FROM reg LEFT JOIN (
                     SELECT unnest(range(0, 52)) AS k,
                            unnest(list_transform(range(0, 52),
                                   x -> CAST(pow(2.0, x) AS BIGINT))) AS p2)
                   ON p2 <= minv
              GROUP BY idx, minv
            ),
            regs AS (
              SELECT d.idx, CAST(coalesce(M, 0) AS BIGINT) AS M
              FROM (SELECT unnest(range(0, 256)) AS idx) d
              LEFT JOIN bl ON d.idx = bl.idx
            ),
            stats AS (
              SELECT sum(pow(2.0, -M)) AS Z,
                     CAST(sum(CASE WHEN M = 0 THEN 1 ELSE 0 END) AS BIGINT)
                         AS V
              FROM regs
            ),
            exact AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS n_exact
                      FROM tk2)
            SELECT n_exact,
                   round({_HLL_EST}, 4) AS n_hll,
                   round(abs({_HLL_EST} - n_exact) / n_exact, 4) AS rel_err
            FROM stats CROSS JOIN exact
        """,
        "ngram_novelty": f"""
            WITH sh AS (
              SELECT doc_id, unnest({_shingles_sql("text", 5)}) AS gram
              FROM documents
            ),
            first AS (SELECT gram, min(doc_id) AS f FROM sh GROUP BY gram)
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_shingles,
                   CAST(sum(CASE WHEN f = doc_id THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_novel,
                   round(sum(CASE WHEN f = doc_id THEN 1 ELSE 0 END)
                         / CAST(count(*) AS DOUBLE), 4) AS novelty
            FROM sh JOIN first USING (gram)
            GROUP BY doc_id
        """,
        "page_index": f"""
            SELECT {_URL.format(id="d.doc_id")} AS url,
                   {_HOST.format(id="d.doc_id")} AS host,
                   strftime(TIMESTAMP '2013-11-13 00:00:00'
                            + to_seconds(d.doc_id), '%Y-%m-%dT%H:%M:%SZ')
                       AS warc_date,
                   length({html_doc}) AS content_length,
                   d.lang
            FROM documents d CROSS JOIN (SELECT count(*) AS n FROM documents) nn
        """,
        "filter_url": f"""
            SELECT {_URL.format(id="doc_id")} AS url FROM documents
            WHERE doc_id % 10 < 3
        """,
        "filter_url_invert": f"""
            SELECT {_URL.format(id="doc_id")} AS url FROM documents
            WHERE NOT regexp_matches({_URL.format(id="doc_id")},
                                     '/doc/1\\d\\.html$')
        """,
        "filter_body": f"""
            SELECT {_URL.format(id="d.doc_id")} AS url
            FROM documents d CROSS JOIN (SELECT count(*) AS n FROM documents) nn
            WHERE regexp_matches({html_doc}, 'window')
        """,
        "extract_text": f"""
            SELECT {_URL.format(id="d.doc_id")} AS url,
                   {html_doc} AS text
            FROM documents d CROSS JOIN (SELECT count(*) AS n FROM documents) nn
        """,
        "http_decode": f"""
            SELECT {_URL.format(id="doc_id")} AS url,
                   200 AS code, 'text/html' AS mime, 1 AS complete
            FROM documents
        """,
        "harvest_links": _LINKS_CTE
        + f"""
            SELECT src_url, {_URL.format(id="target")} AS link FROM links
        """,
        "frontier_candidates": _CAND_CTE
        + "SELECT canon_url, host, src_url FROM cand",
        "politeness_topk": _CAND_CTE
        + f"""
            SELECT host, canon_url FROM (
              SELECT host, canon_url,
                     row_number() OVER (PARTITION BY host ORDER BY canon_url)
                         AS rn
              FROM cand
            ) WHERE rn <= {TOPK}
        """,
        "politeness_topk_salted": _CAND_CTE
        + f"""
            SELECT host, canon_url FROM (
              SELECT host, canon_url,
                     row_number() OVER (PARTITION BY host ORDER BY canon_url)
                         AS rn
              FROM cand
            ) WHERE rn <= {TOPK}
        """,
        "politeness_budgeted": _CAND_CTE
        + """
            SELECT host, canon_url FROM (
              SELECT host, canon_url,
                     row_number() OVER (PARTITION BY host ORDER BY canon_url)
                         AS rn,
                     least(8, CASE WHEN d > 0
                              THEN greatest(1, trunc(3000.0 / d)::INT)
                              ELSE 8 END) AS budget
              FROM (
                SELECT host, canon_url,
                       100 * (1 + CAST(('0x' || substr(md5(host), 1, 2))
                                       AS INT) % 40) AS d
                FROM cand
              )
            ) WHERE rn <= budget
        """,
        "link_rank": """
            WITH nn AS (SELECT count(*) AS n FROM documents),
            e AS (
              SELECT doc_id AS src,
                     (doc_id * 31 + t.i * 97 + 7) % nn.n AS dst
              FROM documents, nn, UNNEST([0,1,2,3,4,5,6,7]) AS t(i)
            ),
            d AS (SELECT src, count(*) AS out_deg FROM e GROUP BY src),
            r0 AS (SELECT doc_id AS node, 1.0::DOUBLE / nn.n AS rank
                   FROM documents, nn),
            r1 AS (
              SELECT v.doc_id AS node,
                     (1.0::DOUBLE - 0.85::DOUBLE) * (1.0::DOUBLE / nn.n)
                       + 0.85::DOUBLE * coalesce(s.in_sum, 0) AS rank
              FROM documents v CROSS JOIN nn LEFT JOIN (
                SELECT e.dst AS node, sum(r0.rank / d.out_deg) AS in_sum
                FROM e JOIN r0 ON r0.node = e.src JOIN d ON d.src = e.src
                GROUP BY e.dst
              ) s ON s.node = v.doc_id
            ),
            r2 AS (
              SELECT v.doc_id AS node,
                     (1.0::DOUBLE - 0.85::DOUBLE) * (1.0::DOUBLE / nn.n)
                       + 0.85::DOUBLE * coalesce(s.in_sum, 0) AS rank
              FROM documents v CROSS JOIN nn LEFT JOIN (
                SELECT e.dst AS node, sum(r1.rank / d.out_deg) AS in_sum
                FROM e JOIN r1 ON r1.node = e.src JOIN d ON d.src = e.src
                GROUP BY e.dst
              ) s ON s.node = v.doc_id
            ),
            r3 AS (
              SELECT v.doc_id AS node,
                     (1.0::DOUBLE - 0.85::DOUBLE) * (1.0::DOUBLE / nn.n)
                       + 0.85::DOUBLE * coalesce(s.in_sum, 0) AS rank
              FROM documents v CROSS JOIN nn LEFT JOIN (
                SELECT e.dst AS node, sum(r2.rank / d.out_deg) AS in_sum
                FROM e JOIN r2 ON r2.node = e.src JOIN d ON d.src = e.src
                GROUP BY e.dst
              ) s ON s.node = v.doc_id
            )
            SELECT node, round(rank, 6) AS rank FROM r3
        """,
        "host_agg": _CAND_CTE
        + """
            SELECT host, count(*) AS n_urls, min(canon_url) AS first_url
            FROM cand GROUP BY host
        """,
        "seen_antijoin": f"""
            SELECT doc_id, n_chars FROM documents
            WHERE doc_id % {SEEN_MOD} <> 0
        """,
        "dedup_exact": f"""
            SELECT md5({_NORM.format(c="text")}) AS content_md5,
                   min(doc_id) AS canonical_id,
                   count(*) AS dup_count
            FROM documents GROUP BY 1
        """,
        "dedup_exact_keep_first": f"""
            SELECT doc_id, n_chars FROM documents
            WHERE doc_id IN (
              SELECT min(doc_id) FROM documents
              GROUP BY md5({_NORM.format(c="text")})
            )
        """,
        "minhash_signature": f"""
            SELECT doc_id,
                   array_to_string([{minhash_cols}], ',') AS minhash_sig
            FROM (
              SELECT doc_id,
                     [CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT)
                      % 2147483647 for sh in {sh}] AS hs
              FROM documents
            )
        """,
        "ngram_jaccard": f"""
            WITH s AS (SELECT doc_id, {sh} AS sh FROM documents)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.sh, b.sh))
                         / greatest(len(list_distinct(a.sh || b.sh)), 1),
                         6) AS jaccard
            FROM s a JOIN s b ON b.doc_id = a.doc_id + 1
        """,
        "ngram_containment": f"""
            WITH s AS (SELECT doc_id, {sh} AS sh FROM documents)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.sh, b.sh))
                         / greatest(len(a.sh), 1), 6)
                       AS containment_a_in_b,
                   round(len(list_intersect(a.sh, b.sh))
                         / greatest(len(b.sh), 1), 6)
                       AS containment_b_in_a,
                   round(len(list_intersect(a.sh, b.sh))
                         / greatest(len(list_distinct(a.sh || b.sh)), 1),
                         6) AS jaccard
            FROM s a JOIN s b ON b.doc_id = a.doc_id + 1
        """,
        "simhash": f"""
            SELECT doc_id,
              list_sum([CASE WHEN
                 list_sum([CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END
                           for h in hs]) > 0
                 THEN CAST(2 ** j AS BIGINT) ELSE 0 END
               for j in range(0, 60)]) :: BIGINT AS simhash
            FROM (
              SELECT doc_id,
                     [CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT)
                      for sh in {sh}] AS hs
              FROM documents
            )
        """,
        "lang_id": f"SELECT doc_id, {lang_expr} AS lang_pred FROM documents",
        "token_counts": """
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                   END AS n_tokens,
                   len(regexp_extract_all(text,
                       '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]')) AS n_bpe_units
            FROM documents
        """,
        "token_frequencies": """
            SELECT token, count(*) AS n FROM (
              SELECT unnest(regexp_split_to_array(trim(text), '\\s+'))
                  AS token
              FROM documents
            ) WHERE token <> ''
            GROUP BY token ORDER BY n DESC, token LIMIT 200
        """,
        "repetition_features": """
            WITH g1 AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\\s+')) AS g
              FROM documents
            ),
            c1 AS (
              SELECT doc_id, g, count(*) AS c FROM g1
              WHERE g <> '' GROUP BY doc_id, g
            ),
            s1 AS (
              SELECT doc_id, sum(c) AS total, count(*) AS dist,
                     max(c) AS top
              FROM c1 GROUP BY doc_id
            ),
            g2 AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(t)),
                            i -> t[i] || ' ' || t[i+1])) AS g
              FROM (SELECT doc_id,
                           regexp_split_to_array(trim(text), '\\s+') AS t
                    FROM documents)
            ),
            c2 AS (
              SELECT doc_id, g, count(*) AS c FROM g2
              WHERE g <> '' GROUP BY doc_id, g
            ),
            s2 AS (
              SELECT doc_id, sum(c) AS total, count(*) AS dist,
                     max(c) AS top
              FROM c2 GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(s1.total, 0) AS BIGINT) AS n_tokens,
                   round(CASE WHEN coalesce(s1.total, 0) > 0
                         THEN 1 - coalesce(s1.dist, 0)
                              / greatest(coalesce(s1.total, 0), 1)
                         ELSE 0 END, 6) AS dup_token_frac,
                   round(CASE WHEN coalesce(s1.total, 0) > 0
                         THEN coalesce(s1.top, 0)
                              / greatest(coalesce(s1.total, 0), 1)
                         ELSE 0 END, 6) AS top_token_frac,
                   round(CASE WHEN coalesce(s2.total, 0) > 0
                         THEN 1 - coalesce(s2.dist, 0)
                              / greatest(coalesce(s2.total, 0), 1)
                         ELSE 0 END, 6) AS dup_2gram_frac,
                   round(CASE WHEN coalesce(s2.total, 0) > 0
                         THEN coalesce(s2.top, 0)
                              / greatest(coalesce(s2.total, 0), 1)
                         ELSE 0 END, 6) AS top_2gram_frac
            FROM documents d
            LEFT JOIN s1 ON d.doc_id = s1.doc_id
            LEFT JOIN s2 ON d.doc_id = s2.doc_id
        """,
        "segment_dedup": """
            WITH segarr AS (
              SELECT doc_id,
                CASE WHEN length(trim(text)) > 0 THEN
                  list_transform(
                    range(0, CAST(ceil(len(t) / 10.0) AS INT)),
                    i -> array_to_string(t[i*10+1 : i*10+10], ' '))
                ELSE [] END AS segs
              FROM (SELECT doc_id,
                           regexp_split_to_array(trim(text), '\\s+') AS t
                    FROM documents)
            ),
            seg AS (
              SELECT doc_id, u['pos'] AS pos, u['seg'] AS seg
              FROM (SELECT doc_id,
                           unnest(list_transform(range(1, len(segs)+1),
                                  i -> {'pos': i-1, 'seg': segs[i]})) AS u
                    FROM segarr)
            ),
            ranked AS (
              SELECT doc_id, pos, seg,
                     row_number() OVER (PARTITION BY seg
                                        ORDER BY doc_id, pos) AS rn
              FROM seg
            ),
            rebuilt AS (
              SELECT doc_id,
                     string_agg(seg, ' ' ORDER BY pos) AS clean_text,
                     count(*) AS n_kept
              FROM ranked WHERE rn = 1 GROUP BY doc_id
            ),
            ntot AS (
              SELECT doc_id, count(*) AS n_segments FROM seg GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(r.clean_text, '') AS clean_text,
                   CAST(coalesce(nt.n_segments, 0) AS BIGINT) AS n_segments,
                   CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept
            FROM documents d
            LEFT JOIN ntot nt ON d.doc_id = nt.doc_id
            LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
        """,
        "bigram_frequencies": """
            SELECT gram, count(*) AS n FROM (
              SELECT unnest(list_transform(range(1, len(t)),
                            i -> t[i] || ' ' || t[i+1])) AS gram
              FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS t
                    FROM documents)
            ) WHERE gram <> ''
            GROUP BY gram ORDER BY n DESC, gram LIMIT 100
        """,
        "skew_report": _CAND_CTE
        + """
            , counts AS (
              SELECT host, count(*) AS n FROM cand GROUP BY host
            ),
            tot AS (
              SELECT CAST(sum(n) AS BIGINT) AS total_rows,
                     count(*) AS n_keys
              FROM counts
            )
            SELECT host, CAST(n AS BIGINT) AS n,
                   round(n / total_rows, 6) AS row_share,
                   round(n / (total_rows / n_keys), 6) AS max_over_uniform
            FROM counts CROSS JOIN tot
            ORDER BY n DESC, host LIMIT 5
        """,
        "mime_sniff": """
            SELECT doc_id,
                   CASE doc_id % 4
                     WHEN 0 THEN 'image/png'
                     WHEN 1 THEN 'image/jpeg'
                     WHEN 2 THEN 'image/x-img1'
                     ELSE 'application/octet-stream'
                   END AS mime
            FROM documents
        """,
        "url_traps": f"""
            WITH h AS (
              SELECT doc_id, 'http://' || {_HOST.format(id="doc_id")} AS base
              FROM documents
            )
            SELECT CASE doc_id % 4
                     WHEN 0 THEN base || '/doc/' || doc_id || '.html'
                     WHEN 1 THEN base || '/doc/' || doc_id || '.html?sess='
                                 || doc_id || '&page=1'
                     WHEN 2 THEN base || '/cal/a/cal/a/cal/a/' || doc_id
                                 || '.html'
                     ELSE base || '/a/b/c/d/e/f/g/h/' || doc_id || '.html'
                   END AS url,
                   CASE doc_id % 4 WHEN 0 THEN 2 WHEN 1 THEN 2
                        WHEN 2 THEN 7 ELSE 9 END AS path_depth,
                   CASE doc_id % 4 WHEN 1 THEN 2 ELSE 0 END
                       AS n_query_params,
                   CASE doc_id % 4 WHEN 2 THEN round(1 - 3/7.0, 6)
                        ELSE 0.0 END AS dup_segment_frac,
                   (doc_id % 4 = 1) AS has_session_id,
                   CASE doc_id % 4 WHEN 0 THEN 0.0 WHEN 1 THEN 5.0
                        WHEN 2 THEN round(round(1 - 3/7.0, 6) * 10 + 2, 6)
                        ELSE 6.0 END AS trap_score
            FROM h
        """,
        "main_content": f"""
            SELECT {_URL.format(id="d.doc_id")} AS url,
                   trim(regexp_replace(
                     replace(replace(replace(replace(replace(replace(
                       regexp_replace(
                         regexp_replace(
                           regexp_replace(
                             regexp_replace(
                               regexp_replace(
                                 regexp_replace(
                                   regexp_replace(
                                     regexp_replace({html_doc},
                                       '(?si)<script[^>]*>.*?</script>',
                                       ' ', 'g'),
                                     '(?si)<style[^>]*>.*?</style>',
                                     ' ', 'g'),
                                   '(?si)<nav[^>]*>.*?</nav>', ' ', 'g'),
                                 '(?si)<header[^>]*>.*?</header>',
                                 ' ', 'g'),
                               '(?si)<footer[^>]*>.*?</footer>',
                               ' ', 'g'),
                             '(?si)<aside[^>]*>.*?</aside>', ' ', 'g'),
                           '(?s)<!--.*?-->', ' ', 'g'),
                         '<[^>]*>', ' ', 'g'),
                       '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
                       '&quot;', '"'), '&#39;', ''''), '&nbsp;', ' '),
                     '\\s+', ' ', 'g')) AS main_text
            FROM documents d
            CROSS JOIN (SELECT count(*) AS n FROM documents) nn
        """,
        "corpus_summary": """
            SELECT lang,
                   count(*) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                   round(quantile_cont(n_tokens, 0.5), 6) AS p50_tokens,
                   round(quantile_cont(n_tokens, 0.9), 6) AS p90_tokens
            FROM (
              SELECT lang,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                     END AS n_tokens
              FROM documents
            )
            GROUP BY lang
        """,
        "revisit_records": f"""
            WITH base AS (
              SELECT {_URL.format(id="d.doc_id")} AS url,
                     d.doc_id,
                     sha256({html_doc}) AS digest
              FROM documents d
              CROSS JOIN (SELECT count(*) AS n FROM documents) nn
            )
            SELECT url, digest, 'response' AS record_type,
                   CAST(NULL AS VARCHAR) AS refers_to_url
            FROM base
            UNION ALL
            SELECT url || '?m=1', digest, 'revisit', url
            FROM base WHERE doc_id < 50
        """,
        "recrawl_priority": """
            SELECT user_id,
                   count(*) AS n_changes,
                   CAST(max(epoch_us(ts))
                        + CASE WHEN count(*) > 1
                          THEN CAST(floor((max(epoch_us(ts))
                               - min(epoch_us(ts)))
                               / (count(*) - 1)) AS BIGINT)
                          ELSE 3600000000 END AS BIGINT) AS next_due_us
            FROM events WHERE event_type = 'view'
            GROUP BY user_id
        """,
        "host_rank": f"""
            WITH nn AS (SELECT count(*) AS n FROM documents),
            e AS (
              SELECT {_HOST.format(id="doc_id")} AS src,
                     {_HOST.format(id="((doc_id * 31 + t.i * 97 + 7) % nn.n)")}
                       AS dst
              FROM documents, nn, UNNEST([0,1,2,3,4,5,6,7]) AS t(i)
            ),
            v AS (SELECT DISTINCT src AS node FROM (
                    SELECT {_HOST.format(id="doc_id")} AS src
                    FROM documents)),
            hn AS (SELECT count(*) AS n FROM v),
            d AS (SELECT src, count(*) AS out_deg FROM e GROUP BY src),
            r0 AS (SELECT node, 1.0::DOUBLE / hn.n AS rank
                   FROM v CROSS JOIN hn),
            r1 AS (
              SELECT v.node,
                     (1.0::DOUBLE - 0.85::DOUBLE) * (1.0::DOUBLE / hn.n)
                       + 0.85::DOUBLE * coalesce(s.in_sum, 0) AS rank
              FROM v CROSS JOIN hn LEFT JOIN (
                SELECT e.dst AS node, sum(r0.rank / d.out_deg) AS in_sum
                FROM e JOIN r0 ON r0.node = e.src JOIN d ON d.src = e.src
                GROUP BY e.dst
              ) s ON s.node = v.node
            ),
            r2 AS (
              SELECT v.node,
                     (1.0::DOUBLE - 0.85::DOUBLE) * (1.0::DOUBLE / hn.n)
                       + 0.85::DOUBLE * coalesce(s.in_sum, 0) AS rank
              FROM v CROSS JOIN hn LEFT JOIN (
                SELECT e.dst AS node, sum(r1.rank / d.out_deg) AS in_sum
                FROM e JOIN r1 ON r1.node = e.src JOIN d ON d.src = e.src
                GROUP BY e.dst
              ) s ON s.node = v.node
            )
            SELECT node AS host, round(rank, 6) AS rank FROM r2
        """,
        "cdx_index": f"""
            SELECT array_to_string(list_reverse(string_split(
                       {_HOST.format(id="d.doc_id")}, '.')), ',')
                     || ')/doc/' || d.doc_id || '.html' AS urlkey,
                   strftime(TIMESTAMP '2013-11-13 00:00:00'
                            + to_seconds(d.doc_id), '%Y%m%d%H%M%S')
                       AS ts14,
                   {_URL.format(id="d.doc_id")} AS original,
                   'text/html' AS mime,
                   200 AS status,
                   sha256({html_doc}) AS digest,
                   CAST(octet_length(encode({html_doc})) AS INT) AS length
            FROM documents d
            CROSS JOIN (SELECT count(*) AS n FROM documents) nn
        """,
        "robots_sitemaps": f"""
            SELECT host,
                   'http://' || host || '/sitemap.xml' AS sitemap_url,
                   1000 AS crawl_delay_ms
            FROM (
              SELECT DISTINCT {_HOST.format(id="doc_id")} AS host
              FROM documents
            )
        """,
        "anchor_texts": _LINKS_CTE
        + f"""
            SELECT src_url, {_URL.format(id="target")} AS link,
                   'link ' || i AS anchor
            FROM links
        """,
        "host_graph": _LINKS_CTE
        + f"""
            SELECT {_HOST.format(id="d.doc_id")} AS src_host,
                   {_HOST.format(id="target")} AS dst_host,
                   count(*) AS n_links
            FROM links JOIN documents d ON links.doc_id = d.doc_id
            GROUP BY 1, 2
        """,
        "pack_sequences": """
            SELECT doc_id,
                   CAST(n_tokens AS INT) AS n_tokens,
                   CAST(cum - n_tokens AS BIGINT) AS tok_start,
                   CAST(floor((cum - n_tokens) / 128.0) AS BIGINT)
                       AS seq_first,
                   CAST(floor(greatest(cum - 1, cum - n_tokens) / 128.0)
                        AS BIGINT) AS seq_last
            FROM (
              SELECT doc_id, n_tokens,
                     sum(n_tokens) OVER (ORDER BY doc_id) AS cum
              FROM (
                SELECT doc_id,
                       CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text),
                                                           '\\s+'))
                       END AS n_tokens
                FROM documents
              )
            )
        """,
        "training_corpus_v2": f"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000, text FROM documents
              WHERE doc_id < 50
              UNION ALL
              SELECT doc_id + 200000,
                     text || ' qq ww ee rr tt yy uu ii oo pp'
              FROM documents WHERE doc_id >= 50 AND doc_id < 60
            ),
            g1 AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\\s+')) AS g
              FROM corpus
            ),
            c1 AS (
              SELECT doc_id, g, count(*) AS c FROM g1
              WHERE g <> '' GROUP BY doc_id, g
            ),
            s1 AS (
              SELECT doc_id, sum(c) AS total, count(*) AS dist FROM c1
              GROUP BY doc_id
            ),
            g2x AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(t)),
                            i -> t[i] || ' ' || t[i+1])) AS g
              FROM (SELECT doc_id,
                           regexp_split_to_array(trim(text), '\\s+') AS t
                    FROM corpus)
            ),
            c2 AS (
              SELECT doc_id, g, count(*) AS c FROM g2x
              WHERE g <> '' GROUP BY doc_id, g
            ),
            s2 AS (
              SELECT doc_id, sum(c) AS total, max(c) AS top FROM c2
              GROUP BY doc_id
            ),
            gate AS (
              SELECT d.doc_id FROM corpus d
              LEFT JOIN s1 ON d.doc_id = s1.doc_id
              LEFT JOIN s2 ON d.doc_id = s2.doc_id
              WHERE CAST(coalesce(s1.total, 0) AS BIGINT) >= 5
                AND round(CASE WHEN coalesce(s1.total, 0) > 0
                      THEN 1 - coalesce(s1.dist, 0)
                           / greatest(coalesce(s1.total, 0), 1)
                      ELSE 0 END, 6) <= 0.8
                AND round(CASE WHEN coalesce(s2.total, 0) > 0
                      THEN coalesce(s2.top, 0)
                           / greatest(coalesce(s2.total, 0), 1)
                      ELSE 0 END, 6) <= 0.2
            ),
            gated AS (
              SELECT d.* FROM corpus d JOIN gate USING (doc_id)
            ),
            kept AS (
              SELECT * FROM gated WHERE doc_id IN (
                SELECT min(doc_id) FROM gated
                GROUP BY md5({_NORM.format(c="text")})
              )
            ),
            segarr AS (
              SELECT doc_id,
                CASE WHEN length(trim(text)) > 0 THEN
                  list_transform(
                    range(0, CAST(ceil(len(t) / 10.0) AS INT)),
                    i -> array_to_string(t[i*10+1 : i*10+10], ' '))
                ELSE [] END AS segs
              FROM (SELECT doc_id,
                           regexp_split_to_array(trim(text), '\\s+') AS t
                    FROM kept)
            ),
            seg AS (
              SELECT doc_id, u['pos'] AS pos, u['seg'] AS seg
              FROM (SELECT doc_id,
                           unnest(list_transform(range(1, len(segs)+1),
                                  i -> {{'pos': i-1, 'seg': segs[i]}})) AS u
                    FROM segarr)
            ),
            ranked AS (
              SELECT doc_id, pos, seg,
                     row_number() OVER (PARTITION BY seg
                                        ORDER BY doc_id, pos) AS rn
              FROM seg
            ),
            rebuilt AS (
              SELECT doc_id,
                     string_agg(seg, ' ' ORDER BY pos) AS clean_text,
                     count(*) AS n_kept
              FROM ranked WHERE rn = 1 GROUP BY doc_id
            ),
            ntot AS (
              SELECT doc_id, count(*) AS n_segments FROM seg GROUP BY doc_id
            )
            SELECT k.doc_id,
                   md5(regexp_replace(regexp_replace(regexp_replace(
                       coalesce(r.clean_text, ''),
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+',
                       '<EMAIL>', 'g'),
                       '[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}',
                       '<IPV4>', 'g'),
                       '\\+?[0-9][0-9()\\-\\. ]{{7,}}[0-9]', '<PHONE>', 'g'))
                       AS final_md5,
                   CAST(coalesce(nt.n_segments, 0) AS BIGINT) AS n_segments,
                   CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept
            FROM kept k
            LEFT JOIN ntot nt ON k.doc_id = nt.doc_id
            LEFT JOIN rebuilt r ON k.doc_id = r.doc_id
        """,
        "gopher_gate": """
            WITH g1 AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\\s+')) AS g
              FROM documents
            ),
            c1 AS (
              SELECT doc_id, g, count(*) AS c FROM g1
              WHERE g <> '' GROUP BY doc_id, g
            ),
            s1 AS (
              SELECT doc_id, sum(c) AS total, count(*) AS dist FROM c1
              GROUP BY doc_id
            ),
            g2 AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(t)),
                            i -> t[i] || ' ' || t[i+1])) AS g
              FROM (SELECT doc_id,
                           regexp_split_to_array(trim(text), '\\s+') AS t
                    FROM documents)
            ),
            c2 AS (
              SELECT doc_id, g, count(*) AS c FROM g2
              WHERE g <> '' GROUP BY doc_id, g
            ),
            s2 AS (
              SELECT doc_id, sum(c) AS total, max(c) AS top FROM c2
              GROUP BY doc_id
            ),
            feats AS (
              SELECT d.doc_id,
                     CAST(coalesce(s1.total, 0) AS BIGINT) AS n_tokens,
                     round(CASE WHEN coalesce(s1.total, 0) > 0
                           THEN 1 - coalesce(s1.dist, 0)
                                / greatest(coalesce(s1.total, 0), 1)
                           ELSE 0 END, 6) AS dup_token_frac,
                     round(CASE WHEN coalesce(s2.total, 0) > 0
                           THEN coalesce(s2.top, 0)
                                / greatest(coalesce(s2.total, 0), 1)
                           ELSE 0 END, 6) AS top_2gram_frac
              FROM documents d
              LEFT JOIN s1 ON d.doc_id = s1.doc_id
              LEFT JOIN s2 ON d.doc_id = s2.doc_id
            )
            SELECT doc_id,
                   coalesce(array_to_string([x FOR x IN [
                     CASE WHEN n_tokens < 5 THEN 'too_short' END,
                     CASE WHEN dup_token_frac > 0.8
                          THEN 'repetitive_tokens' END,
                     CASE WHEN top_2gram_frac > 0.2
                          THEN 'repetitive_2grams' END
                   ] IF x IS NOT NULL], ','), '') AS drop_reasons,
                   coalesce(array_to_string([x FOR x IN [
                     CASE WHEN n_tokens < 5 THEN 'too_short' END,
                     CASE WHEN dup_token_frac > 0.8
                          THEN 'repetitive_tokens' END,
                     CASE WHEN top_2gram_frac > 0.2
                          THEN 'repetitive_2grams' END
                   ] IF x IS NOT NULL], ','), '') = '' AS keep
            FROM feats
        """,
        "sitemap_seeds": f"""
            WITH nn AS (SELECT count(*) AS n FROM documents)
            SELECT DISTINCT
                   {_URL.format(id="d.doc_id")} AS sitemap_url,
                   {_URL.format(id="((d.doc_id + j.j * 7 + 1) % nn.n)")}
                       AS seed_url
            FROM documents d
            CROSS JOIN nn
            CROSS JOIN (SELECT unnest(range(0, 10)) AS j) j
            WHERE d.doc_id % 50 = 0
        """,
        "stratified_sample": f"""
            SELECT doc_id, source FROM (
              SELECT doc_id, source,
                     (CAST(('0x' || substr(md5('mix-v1:'
                           || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                      % 1000000) / 1000000.0 AS u,
                     {_MIX_FRAC_SQL} AS f
              FROM documents
            ) WHERE u < f
        """,
        "winnow_fingerprints": _WINNOW_CTE + """
            SELECT doc_id,
                   CAST(split_part(f, ':', 2) AS BIGINT) AS pos,
                   split_part(f, ':', 1) AS fingerprint
            FROM (SELECT doc_id, unnest(fps) AS f FROM sel)
        """,
        "winnow_match_scores": _WINNOW_CTE + """
            , fp AS (
              SELECT DISTINCT doc_id,
                     split_part(f, ':', 1) AS fingerprint
              FROM (SELECT doc_id, unnest(fps) AS f FROM sel)
            ),
            -- df gate: over-common fingerprints are boilerplate, and
            -- a d-doc fingerprint fans the self-join out d^2 — same
            -- gate as the Spark operator's max_doc_freq
            keep AS (
              SELECT fingerprint FROM (
                SELECT fingerprint, count(*) AS df
                FROM fp GROUP BY fingerprint
              ) WHERE df BETWEEN 2 AND 100
            ),
            fpk AS (SELECT fp.* FROM fp JOIN keep USING (fingerprint))
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   count(*) AS n_shared
            FROM fpk a JOIN fpk b
              ON a.fingerprint = b.fingerprint
             AND a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING count(*) >= 3
        """,
        "split_assign": """
            SELECT doc_id,
                   CASE WHEN u < 0.05 THEN 'test'
                        WHEN u < 0.95 THEN 'train'
                        ELSE 'val' END AS split
            FROM (
              SELECT doc_id,
                     (CAST(('0x' || substr(md5('split-v1:'
                           || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                      % 1000000) / 1000000.0 AS u
              FROM documents
            )
        """,
        "bpe_pair_counts": """
            SELECT pair, count(*) AS n FROM (
              SELECT unnest(list_transform(range(1, length(w)),
                            i -> substr(w, i, 2))) AS pair
              FROM (
                SELECT unnest(regexp_split_to_array(trim(text),
                                                    '\\s+')) AS w
                FROM documents
              ) WHERE length(w) >= 2
            )
            GROUP BY pair
            ORDER BY n DESC, pair ASC
            LIMIT 200
        """,
        "fixed_n_sample": """
            SELECT doc_id, source FROM (
              SELECT doc_id, source,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY (CAST(('0x' || substr(md5('mix-v1:'
                                 || CAST(doc_id AS VARCHAR)), 1, 15))
                                 AS BIGINT) % 1000000) ASC,
                                doc_id ASC
                     ) AS rn
              FROM documents
            ) WHERE rn <= 5
        """,
        "corpus_mix": f"""
            WITH samp AS (
              SELECT doc_id, source FROM (
                SELECT doc_id, source,
                       (CAST(('0x' || substr(md5('mix-v1:'
                             || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                        % 1000000) / 1000000.0 AS u,
                       {_MIX_FRAC_SQL} AS f
                FROM documents
              ) WHERE u < f
            ),
            tot AS (
              SELECT source, count(*) AS n_corpus FROM documents
              GROUP BY source
            ),
            got AS (
              SELECT source, count(*) AS n_sampled FROM samp GROUP BY source
            )
            SELECT t.source,
                   CAST(t.n_corpus AS BIGINT) AS n_corpus,
                   CAST(coalesce(g.n_sampled, 0) AS BIGINT) AS n_sampled,
                   round(coalesce(g.n_sampled, 0) / t.n_corpus, 6)
                       AS achieved_frac
            FROM tot t LEFT JOIN got g ON t.source = g.source
        """,
        "wet_records": f"""
            SELECT {_URL.format(id="d.doc_id")} AS url,
                   'conversion' AS rec_type,
                   '<urn:uuid:' || md5({_URL.format(id="d.doc_id")}) || '>'
                       AS refers_to,
                   CAST(octet_length(encode({html_doc})) AS BIGINT)
                       AS content_length,
                   md5({html_doc}) AS payload_md5
            FROM documents d
            CROSS JOIN (SELECT count(*) AS n FROM documents) nn
        """,
        "decontaminate": f"""
            WITH p AS (
              SELECT DISTINCT unnest({_shingles_sql("text", 13)}) AS shingle
              FROM documents WHERE doc_id < 10
            ),
            c AS (
              SELECT doc_id, unnest({_shingles_sql("text", 13)}) AS shingle
              FROM documents
            ),
            hits AS (SELECT DISTINCT doc_id FROM c JOIN p USING (shingle))
            SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
            FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        """,
        "scrub_pii": f"""
            WITH dirty AS (
              SELECT doc_id,
                     text || ' contact user' || doc_id
                       || '@mail.example.org or +1 (555) 010-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       || ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                       || '.7' AS dirty
              FROM documents
            ),
            clean AS (
              SELECT doc_id,
                     regexp_replace(regexp_replace(regexp_replace(dirty,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+',
                       '<EMAIL>', 'g'),
                       '[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}',
                       '<IPV4>', 'g'),
                       '\\+?[0-9][0-9()\\-\\. ]{{7,}}[0-9]', '<PHONE>', 'g')
                       AS clean
              FROM dirty
            )
            SELECT doc_id, clean FROM clean
            WHERE clean NOT LIKE '%@%' AND clean NOT LIKE '%10.0.%'
        """,
        "quality_score": """
            SELECT doc_id, n_tokens, n_punct, n_distinct_tokens,
                   round(least(n_tokens, 100) * 0.3
                         + (n_distinct_tokens / greatest(n_tokens, 1)) * 30
                         + (n_stop / greatest(n_tokens, 1)) * 100 * 0.2
                         + (1 - least((n_punct / greatest(n_chars2, 1)) * 5,
                                      1.0)) * 20, 4) AS quality_score
            FROM (
              SELECT doc_id,
                CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                END AS n_tokens,
                len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
                len(list_distinct(regexp_split_to_array(trim(text), '\\s+')))
                    AS n_distinct_tokens,
                len(list_filter(regexp_split_to_array(trim(lower(text)),
                                                      '\\s+'),
                    t -> list_contains(['the','and','of','to','a','in','is',
                                        'that'], t))) AS n_stop,
                length(text) AS n_chars2
              FROM documents
            )
        """,
        "doc_fingerprint": f"""
            SELECT doc_id,
                   md5(norm) AS content_md5,
                   CASE WHEN length(norm) >= 8 THEN
                     list_min([md5(substr(norm, i, 8))
                               for i in range(1, length(norm) - 6)])
                   ELSE md5(norm) END AS min_kgram_md5
            FROM (SELECT doc_id, {_NORM.format(c="text")} AS norm
                  FROM documents)
        """,
        "lsh_topk": f"""
            WITH keys AS ({_hyperplane_bands_sql()}),
            qk AS (SELECT band, band_key FROM keys WHERE vec_id = 0),
            cands AS (
              SELECT DISTINCT k.vec_id FROM keys k
              JOIN qk ON k.band = qk.band AND k.band_key = qk.band_key
            ),
            q AS (
              SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
              WHERE vec_id = 0
            )
            SELECT e.vec_id,
                   round(
                     list_sum([v[i] * qv[i]
                               for i in range(1, len(v) + 1)])
                     / (sqrt(list_sum([x * x for x in qv]))
                        * sqrt(list_sum([x * x for x in v]))), 6) AS cosine
            FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                  FROM embeddings) e
            JOIN cands ON e.vec_id = cands.vec_id
            CROSS JOIN q
            ORDER BY cosine DESC, e.vec_id LIMIT 10
        """,
        "embedding_topk": """
            WITH q AS (
              SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
              WHERE vec_id = 0
            )
            SELECT vec_id,
                   round(
                     list_sum([v[i] * qv[i]
                               for i in range(1, len(v) + 1)])
                     / (sqrt(list_sum([x * x for x in qv]))
                        * sqrt(list_sum([x * x for x in v]))), 6) AS cosine
            FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                  FROM embeddings) CROSS JOIN q
            ORDER BY cosine DESC, vec_id LIMIT 10
        """,
        "embedding_neardup": """
            WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(
                     list_sum([a.v[i] * b.v[i]
                               for i in range(1, len(a.v) + 1)])
                     / (sqrt(list_sum([x * x for x in a.v]))
                        * sqrt(list_sum([x * x for x in b.v]))), 6) AS cosine
            FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_sum([a.v[i] * b.v[i] for i in range(1, len(a.v) + 1)])
                  / (sqrt(list_sum([x * x for x in a.v]))
                     * sqrt(list_sum([x * x for x in b.v]))) >= 0.3
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_q3ish": """
            SELECT o_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey
            ORDER BY revenue DESC, o_orderkey LIMIT 10
        """,
        "tpch_q5ish": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
            GROUP BY n_name
        """,
        "events_sessionize": """
            SELECT event_id, user_id,
                   CAST(sum(new_session) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_seq
            FROM (
              SELECT event_id, user_id, ts,
                CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                     > 1800 * 1000000 OR lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
              FROM events
            )
        """,
        "lsh_band_buckets": f"""
            WITH hsrc AS (
              SELECT doc_id,
                     [CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT)
                      % 2147483647 for sh in {sh}] AS hs
              FROM documents
            ),
            sig AS (SELECT doc_id, [{minhash_cols}] AS sig FROM hsrc)
            SELECT doc_id, t.b['band'] AS band, t.b['band_key'] AS band_key
            FROM sig, UNNEST([
              {{'band': 0, 'band_key': sig[1]::VARCHAR || '-' || sig[2]::VARCHAR}},
              {{'band': 1, 'band_key': sig[3]::VARCHAR || '-' || sig[4]::VARCHAR}},
              {{'band': 2, 'band_key': sig[5]::VARCHAR || '-' || sig[6]::VARCHAR}},
              {{'band': 3, 'band_key': sig[7]::VARCHAR || '-' || sig[8]::VARCHAR}}
            ]) AS t(b)
        """,
        "dedup_clusters": f"""
            WITH RECURSIVE hsrc AS (
              SELECT doc_id,
                     [CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT)
                      % 2147483647 for sh in {sh}] AS hs
              FROM documents
            ),
            sig AS (SELECT doc_id, [{minhash_cols}] AS sig FROM hsrc),
            banded AS (
              SELECT doc_id, t.b['band'] AS band, t.b['band_key'] AS band_key
              FROM sig, UNNEST([
                {{'band': 0, 'band_key': sig[1]::VARCHAR || '-' || sig[2]::VARCHAR}},
                {{'band': 1, 'band_key': sig[3]::VARCHAR || '-' || sig[4]::VARCHAR}},
                {{'band': 2, 'band_key': sig[5]::VARCHAR || '-' || sig[6]::VARCHAR}},
                {{'band': 3, 'band_key': sig[7]::VARCHAR || '-' || sig[8]::VARCHAR}}
              ]) AS t(b)
            ),
            edges AS (
              SELECT a.doc_id AS src, b.doc_id AS dst
              FROM banded a JOIN banded b
                ON a.band = b.band AND a.band_key = b.band_key
               AND a.doc_id <> b.doc_id
            ),
            reach(src, dst) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
            )
            SELECT src AS doc_id, min(dst) AS cluster_id
            FROM reach GROUP BY src
        """,
        "training_corpus": f"""
            WITH RECURSIVE q AS (
              SELECT doc_id,
                     round(least(n_tokens, 100) * 0.3
                       + (n_distinct_tokens / greatest(n_tokens, 1)) * 30
                       + (n_stop / greatest(n_tokens, 1)) * 100 * 0.2
                       + (1 - least((n_punct / greatest(n_chars2, 1)) * 5,
                                    1.0)) * 20, 4) AS quality_score
              FROM (
                SELECT doc_id,
                  CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                  END AS n_tokens,
                  len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
                  len(list_distinct(regexp_split_to_array(trim(text),
                                                          '\\s+')))
                      AS n_distinct_tokens,
                  len(list_filter(regexp_split_to_array(trim(lower(text)),
                                                        '\\s+'),
                      t -> list_contains(['the','and','of','to','a','in',
                                          'is','that'], t))) AS n_stop,
                  length(text) AS n_chars2
                FROM documents
              )
            ),
            l AS (SELECT doc_id, {_lang_sql()} AS lang_pred FROM documents),
            gated AS (
              SELECT d.doc_id, d.text, l.lang_pred, q.quality_score
              FROM documents d
              JOIN q USING (doc_id) JOIN l USING (doc_id)
              WHERE q.quality_score >= 50 AND l.lang_pred IN ('en')
            ),
            kept AS (
              SELECT g.* FROM gated g
              JOIN (
                SELECT min(doc_id) AS doc_id
                FROM (SELECT doc_id, md5({_NORM.format(c="text")}) AS cm
                      FROM gated)
                GROUP BY cm
              ) k USING (doc_id)
            ),
            sdocs AS (SELECT doc_id, {sh} AS shg FROM kept),
            hsrc AS (
              SELECT doc_id,
                     [CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)
                      % 2147483647 for x in {sh}] AS hs
              FROM kept
            ),
            sig AS (SELECT doc_id, [{minhash_cols}] AS sig FROM hsrc),
            banded AS (
              SELECT doc_id, t.b['band'] AS band, t.b['band_key'] AS band_key
              FROM sig, UNNEST([
                {{'band': 0, 'band_key': sig[1]::VARCHAR || '-' || sig[2]::VARCHAR}},
                {{'band': 1, 'band_key': sig[3]::VARCHAR || '-' || sig[4]::VARCHAR}},
                {{'band': 2, 'band_key': sig[5]::VARCHAR || '-' || sig[6]::VARCHAR}},
                {{'band': 3, 'band_key': sig[7]::VARCHAR || '-' || sig[8]::VARCHAR}}
              ]) AS t(b)
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM banded a JOIN banded b
                ON a.band = b.band AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
            ),
            ver AS (
              SELECT id_a, id_b FROM cand
              JOIN sdocs sa ON sa.doc_id = id_a
              JOIN sdocs sb ON sb.doc_id = id_b
              WHERE len(list_intersect(sa.shg, sb.shg))
                    / len(list_distinct(sa.shg || sb.shg)) >= 0.8
            ),
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM ver
              UNION ALL SELECT id_b, id_a FROM ver
            ),
            reach(src, dst) AS (
              SELECT doc_id, doc_id FROM kept
              UNION
              SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
            )
            SELECT k.doc_id, k.lang_pred, k.quality_score
            FROM kept k
            JOIN (SELECT src FROM reach GROUP BY src
                  HAVING min(dst) = src) s ON s.src = k.doc_id
        """,
        "dedup_survivors": f"""
            WITH RECURSIVE sdocs AS (
              SELECT doc_id, {sh} AS shg FROM documents
            ),
            hsrc AS (
              SELECT doc_id,
                     [CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)
                      % 2147483647 for x in {sh}] AS hs
              FROM documents
            ),
            sig AS (SELECT doc_id, [{minhash_cols}] AS sig FROM hsrc),
            banded AS (
              SELECT doc_id, t.b['band'] AS band, t.b['band_key'] AS band_key
              FROM sig, UNNEST([
                {{'band': 0, 'band_key': sig[1]::VARCHAR || '-' || sig[2]::VARCHAR}},
                {{'band': 1, 'band_key': sig[3]::VARCHAR || '-' || sig[4]::VARCHAR}},
                {{'band': 2, 'band_key': sig[5]::VARCHAR || '-' || sig[6]::VARCHAR}},
                {{'band': 3, 'band_key': sig[7]::VARCHAR || '-' || sig[8]::VARCHAR}}
              ]) AS t(b)
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM banded a JOIN banded b
                ON a.band = b.band AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
            ),
            ver AS (
              SELECT id_a, id_b
              FROM cand
              JOIN sdocs sa ON sa.doc_id = id_a
              JOIN sdocs sb ON sb.doc_id = id_b
              WHERE len(list_intersect(sa.shg, sb.shg))
                    / len(list_distinct(sa.shg || sb.shg)) >= 0.8
            ),
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM ver
              UNION ALL SELECT id_b, id_a FROM ver
            ),
            reach(src, dst) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
            )
            SELECT src AS doc_id FROM reach
            GROUP BY src HAVING min(dst) = src
        """,
        "hyperplane_bands": _hyperplane_bands_sql(),
        "image_features": """
            WITH v AS (SELECT vec_id AS media_id,
                              CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
            q AS (SELECT media_id,
                    [trunc(((x - list_min(v))
                            / (list_max(v) - list_min(v) + 1e-9)) * 255)
                     for x in v] AS px
                  FROM v)
            SELECT media_id,
                   round(list_sum(px) / len(px), 6) AS px_mean,
                   round(sqrt(list_sum([(x - list_sum(px) / len(px)) ** 2
                                        for x in px]) / len(px)), 6) AS px_std,
                   round(len(list_filter(px, x -> x < 32)) / len(px), 6)
                       AS hist0
            FROM q
        """,
        "unpack_paths": f"""
            SELECT {_URL.format(id="doc_id")} AS url,
                   'http/' || {_HOST.format(id="doc_id")}
                     || '/doc/' || doc_id || '.html' AS out_path
            FROM documents
        """,
        "events_hourly": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                       AS hour,
                   event_type, count(*) AS n,
                   round(sum(value), 3) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        # epoch-0 schedule: seeds are url_for(0,7,14,...) at depth 0
        # (doc_ids are contiguous 0..n-1, so doc_id % 7 = 0 IS
        # range(0, n, 7)); canonicalization is the identity on the
        # synthetic URLs; politeness = top-10 per host ordered by
        # (depth, canon_url) — the same CTE style as politeness_topk.
        "frontier_epoch": f"""
            WITH seeds AS (
              SELECT {_URL.format(id="doc_id")} AS canon_url,
                     {_HOST.format(id="doc_id")} AS host,
                     0 AS depth
              FROM documents WHERE doc_id % 7 = 0
            )
            SELECT canon_url, host, depth FROM (
              SELECT seeds.*, row_number() OVER (
                PARTITION BY host ORDER BY depth, canon_url
              ) AS rn FROM seeds
            ) WHERE rn <= 10
        """,
        # roundtrip invariants from the document model: every doc_id<200
        # page serializes and reparses with its url intact, the record
        # content-length equal to the http payload length, and no
        # parse errors.
        "warc_roundtrip": f"""
            SELECT {_URL.format(id="doc_id")} AS url,
                   TRUE AS matches, TRUE AS clen_match, 0 AS n_errors
            FROM documents WHERE doc_id < 200
        """,
        # two-tier dedup exactness: both counts must equal the exact
        # anti-join count, fully derivable from the corpus model —
        # candidates are distinct link targets not pre-seen
        # (target % SEEN_MOD <> 0), the query-local seen set is the
        # even ids, so survivors are the odd ones.
        "bloom_dedup": _LINKS_CTE
        + f""",
            cand AS (
              SELECT DISTINCT target FROM links
              WHERE target % {SEEN_MOD} <> 0
            )
            SELECT count(*) FILTER (WHERE target % 2 <> 0) AS exact_count,
                   count(*) FILTER (WHERE target % 2 <> 0) AS two_tier_count
            FROM cand
        """,
        # deterministic Lloyd: init centroids = vec_id 0..7, one
        # update (round-6 per-dim avg), final assignment; argmin
        # breaks ties on cluster id
        "kmeans_assign": _KMEANS_CTE
        + """
            SELECT vec_id, cluster, round(sqrt(d2), 6) AS dist FROM (
              SELECT vec_id, cluster, d2, row_number() OVER (
                PARTITION BY vec_id ORDER BY d2, cluster) AS rn
              FROM d2t) WHERE rn = 1
        """,
        # IVF-kmeans ANN: probe the 2 cells nearest the query (vec 0),
        # exact cosine rerank inside them — full pipeline replayed
        "ivf_kmeans_topk": _KMEANS_CTE
        + """
            , m2 AS (
              SELECT vec_id, cluster FROM (
                SELECT vec_id, cluster, row_number() OVER (
                  PARTITION BY vec_id ORDER BY d2, cluster) AS rn
                FROM d2t) WHERE rn = 1
            ),
            q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
            probe AS (
              SELECT cluster FROM (
                SELECT c1.cluster,
                       list_sum(list_transform(list_zip(q.qv, c1.c),
                                p -> (p[1]-p[2])*(p[1]-p[2]))) AS qd
                FROM c1 CROSS JOIN q)
              ORDER BY qd, cluster LIMIT 2
            )
            SELECT e.vec_id,
                   round(
                     list_sum(list_transform(list_zip(e.v, q.qv),
                              p -> p[1]*p[2]))
                     / (sqrt(list_sum(list_transform(q.qv, x -> x*x)))
                        * sqrt(list_sum(list_transform(e.v, x -> x*x)))),
                     6) AS cosine
            FROM e JOIN m2 USING (vec_id) CROSS JOIN q
            WHERE m2.cluster IN (SELECT cluster FROM probe)
            ORDER BY cosine DESC, e.vec_id LIMIT 10
        """,
        # SemDeDup: drop any vector whose k-means cell holds a
        # lower-id vector at cosine >= 0.5 (round-6 both engines)
        "semdedup": _KMEANS_CTE
        + """
            , m2 AS (
              SELECT vec_id, cluster FROM (
                SELECT vec_id, cluster, row_number() OVER (
                  PARTITION BY vec_id ORDER BY d2, cluster) AS rn
                FROM d2t) WHERE rn = 1
            ),
            ke AS (SELECT e.vec_id, m2.cluster, e.v
                   FROM e JOIN m2 USING (vec_id)),
            dropped AS (
              SELECT DISTINCT x.vec_id
              FROM ke x JOIN ke y
                ON x.cluster = y.cluster AND y.vec_id < x.vec_id
              WHERE round(
                      list_sum(list_transform(list_zip(x.v, y.v),
                               p -> p[1]*p[2]))
                      / (sqrt(list_sum(list_transform(x.v, q -> q*q)))
                         * sqrt(list_sum(list_transform(y.v, q -> q*q)))),
                      6) >= 0.5
            )
            SELECT vec_id, cluster FROM ke
            WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
        """,
        "corpus_drift": """
            WITH ta AS (
              SELECT token, count(*) AS na FROM (
                SELECT unnest(regexp_split_to_array(trim(text), '\\s+'))
                    AS token
                FROM documents WHERE doc_id % 2 = 0
              ) WHERE token <> '' GROUP BY token
            ),
            tb AS (
              SELECT token, count(*) AS nb FROM (
                SELECT unnest(regexp_split_to_array(trim(text), '\\s+'))
                    AS token
                FROM documents WHERE doc_id % 2 = 1
              ) WHERE token <> '' GROUP BY token
            ),
            j AS (
              SELECT coalesce(ta.na, 0) AS na, coalesce(tb.nb, 0) AS nb
              FROM ta FULL OUTER JOIN tb USING (token)
            ),
            tot AS (
              SELECT CAST(sum(na) AS DOUBLE) AS sta,
                     CAST(sum(nb) AS DOUBLE) AS stb,
                     CAST(count(*) AS DOUBLE) AS v
              FROM j
            )
            SELECT CAST(sum(na) AS BIGINT) AS tokens_a,
                   CAST(sum(nb) AS BIGINT) AS tokens_b,
                   CAST(sum(CASE WHEN na > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS vocab_a,
                   CAST(sum(CASE WHEN nb > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS vocab_b,
                   CAST(sum(CASE WHEN na > 0 AND nb > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS vocab_overlap,
                   round(sum(((na+1)/(sta+v)) *
                             ln(((na+1)/(sta+v)) / ((nb+1)/(stb+v)))), 4)
                       AS kl_a_b
            FROM j CROSS JOIN tot
        """,
        "chunk_documents": """
            WITH d AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN []
                          ELSE regexp_split_to_array(trim(text), '\\s+')
                     END AS t
              FROM documents
            ),
            lim AS (
              SELECT doc_id, t,
                     least(CAST(ceil(greatest(len(t) - 64, 0) / 32.0) * 32
                                AS BIGINT),
                           len(t) - 1) AS last_start
              FROM d WHERE len(t) > 0
            ),
            st AS (
              SELECT doc_id, t,
                     unnest(range(0, last_start + 1, 32)) AS s,
                     generate_subscripts(range(0, last_start + 1, 32), 1) - 1
                         AS chunk_id
              FROM lim
            )
            SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
                   CAST(s AS INT) AS tok_start,
                   CAST(least(64, len(t) - s) AS INT) AS n_tokens,
                   array_to_string(t[s+1:s+64], ' ') AS chunk
            FROM st
        """,
        "duplicate_spans": _SPANS_CTE
        + """
            SELECT doc_id, span_start, span_end, n_tokens FROM spans
        """,
        "remove_duplicate_spans": _SPANS_CTE
        + """
            , tok AS (
              SELECT doc_id, unnest(t) AS tokval,
                     generate_subscripts(t, 1) - 1 AS p
              FROM d
            ),
            kept AS (
              SELECT tok.doc_id, tok.p, tok.tokval FROM tok
              WHERE NOT EXISTS (
                SELECT 1 FROM spans s
                WHERE s.doc_id = tok.doc_id
                  AND tok.p >= s.span_start AND tok.p < s.span_end)
            )
            SELECT d.doc_id,
                   coalesce(string_agg(kept.tokval, ' ' ORDER BY kept.p),
                            '') AS clean_text,
                   len(d.t) - count(kept.p) AS n_removed_tokens
            FROM d LEFT JOIN kept USING (doc_id)
            GROUP BY d.doc_id, len(d.t)
        """,
        "inverted_index": """
            WITH d AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
              FROM documents
            ),
            raw AS (
              SELECT doc_id, unnest(t) AS term,
                     generate_subscripts(t, 1) - 1 AS pos
              FROM d
            ),
            toks AS (SELECT * FROM raw WHERE term <> '')
            SELECT term, count(*) AS n_postings,
                   count(DISTINCT doc_id) AS df,
                   string_agg(doc_id || ':' || pos, ','
                              ORDER BY doc_id, pos) AS postings
            FROM toks GROUP BY term
            HAVING count(DISTINCT doc_id) >= 5
        """,
        "rag_corpus": _SPANS_CTE
        + """
            , tok AS (
              SELECT doc_id, unnest(t) AS tokval,
                     generate_subscripts(t, 1) - 1 AS p
              FROM d
            ),
            kept AS (
              SELECT tok.doc_id, tok.p, tok.tokval FROM tok
              WHERE NOT EXISTS (
                SELECT 1 FROM spans s
                WHERE s.doc_id = tok.doc_id
                  AND tok.p >= s.span_start AND tok.p < s.span_end)
            ),
            ct AS (
              SELECT doc_id, list(tokval ORDER BY p) AS t2
              FROM kept GROUP BY doc_id
            ),
            lim AS (
              SELECT doc_id, t2,
                     least(CAST(ceil(greatest(len(t2) - 64, 0) / 32.0) * 32
                                AS BIGINT),
                           len(t2) - 1) AS last_start
              FROM ct WHERE len(t2) > 0
            ),
            st AS (
              SELECT doc_id, t2,
                     unnest(range(0, last_start + 1, 32)) AS s,
                     generate_subscripts(range(0, last_start + 1, 32), 1) - 1
                         AS chunk_id
              FROM lim
            )
            SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
                   CAST(s AS INT) AS tok_start,
                   CAST(least(64, len(t2) - s) AS INT) AS n_tokens,
                   array_to_string(t2[s+1:s+64], ' ') AS chunk
            FROM st WHERE least(64, len(t2) - s) >= 8
        """,
        "quality_model_moments": _quality_model_moments_sql(),
        "length_report": """
            SELECT count(*) AS n_docs,
                   CAST(sum(n) AS BIGINT) AS total_tokens,
                   round(avg(n), 6) AS mean_tokens,
                   min(n) AS min_tokens, max(n) AS max_tokens,
                   quantile_cont(n, 0.25) AS p25,
                   quantile_cont(n, 0.5) AS p50,
                   quantile_cont(n, 0.75) AS p75,
                   quantile_cont(n, 0.95) AS p95
            FROM (
              SELECT CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text),
                                                         '\\s+'))
                     END AS n
              FROM documents
            )
        """,
        "inverted_index_segmented": """
            WITH d AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
              FROM documents
            ),
            raw AS (
              SELECT doc_id, unnest(t) AS term,
                     generate_subscripts(t, 1) - 1 AS pos
              FROM d
            ),
            toks AS (SELECT * FROM raw WHERE term <> ''),
            counts AS (
              SELECT term, count(*) AS n_term_postings,
                     count(DISTINCT doc_id) AS df
              FROM toks GROUP BY term
            ),
            seg AS (
              SELECT toks.doc_id, toks.pos, toks.term, counts.df,
                     CAST(
                       CAST(('0x' || substr(md5(CAST(toks.doc_id
                                                     AS VARCHAR)), 1, 15))
                            AS BIGINT)
                       % greatest(CAST(ceil(counts.n_term_postings / 40.0)
                                       AS BIGINT), 1)
                     AS INT) AS segment
              FROM toks JOIN counts USING (term)
              WHERE counts.df >= 5
            )
            SELECT term, segment, min(df) AS df,
                   count(*) AS n_postings,
                   string_agg(doc_id || ':' || pos, ','
                              ORDER BY doc_id, pos) AS postings
            FROM seg GROUP BY term, segment
        """,
        "unigram_logprob": """
            WITH tk AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\\s+'))
                         AS token
              FROM documents
            ),
            tk2 AS (SELECT * FROM tk WHERE token <> ''),
            freq AS (SELECT token, count(*) AS n FROM tk2 GROUP BY token),
            tt AS (SELECT count(*) AS t FROM tk2)
            SELECT doc_id, count(*) AS n_tokens,
                   round(avg(-ln(n / CAST(t AS DOUBLE))), 4)
                       AS mean_neg_logprob
            FROM tk2 JOIN freq USING (token) CROSS JOIN tt
            GROUP BY doc_id
        """,
        "bigram_logprob": """
            WITH t AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(text), '\\s+') AS w
              FROM documents
            ),
            bg AS (
              SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
              FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
                    FROM t WHERE len(w) >= 2)
              WHERE w[i] <> '' AND w[i + 1] <> ''
            ),
            c12 AS (SELECT w1, w2, count(*) AS n12 FROM bg
                    GROUP BY w1, w2),
            c1 AS (SELECT w1, count(*) AS n1 FROM bg GROUP BY w1)
            SELECT doc_id, count(*) AS n_bigrams,
                   round(avg(-ln(n12 / CAST(n1 AS DOUBLE))), 4)
                       AS mean_neg_logprob2
            FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
            GROUP BY doc_id
        """,
        "tfidf_keywords": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\\s+'))
                         AS term
              FROM documents
            ),
            tf AS (
              SELECT doc_id, term, count(*) AS tf FROM toks
              WHERE term <> '' GROUP BY doc_id, term
            ),
            df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            nn AS (SELECT count(*) AS n FROM documents)
            SELECT doc_id, term, tf, df,
                   round(tf * ln(CAST(n AS DOUBLE) / df), 6) AS score
            FROM (
              SELECT tf.doc_id, tf.term, tf.tf, df.df, nn.n,
                     row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.tf * ln(CAST(nn.n AS DOUBLE) / df.df)
                                DESC, tf.term
                     ) AS rn
              FROM tf JOIN df USING (term) CROSS JOIN nn
            )
            WHERE rn <= 3
        """,
        "cuckoo_dedup": _LINKS_CTE
        + f""",
            cand AS (
              SELECT DISTINCT target FROM links
              WHERE target % {SEEN_MOD} <> 0
            )
            SELECT count(*) FILTER (WHERE target % 2 <> 0) AS exact_count,
                   count(*) FILTER (WHERE target % 2 <> 0) AS cuckoo_count
            FROM cand
        """,
    }
