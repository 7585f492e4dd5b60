"""Deterministic synthetic web-page corpus generator (input_hint shape).

The driver's documents.parquet has a 31-term vocabulary — every term is a
head term.  Benchmarks and WAND tests also need realistic shape: a large
Zipf vocabulary with genuinely rare terms AND stop-word-like heads (the
reference corpus had max posting list ≈ corpus size,
/root/reference/doc-search-test.md:39).

Generation is 100% JVM-side expressions over ``spark.range`` (xxhash64 →
log-uniform rank ≈ Zipf s=1), so it scales linearly with cores and never
touches Python — synthesizing 10^6 docs takes seconds on local[32].
No external data; fully determined by (n_docs, vocab, seed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LANGS = ["en", "ja", "es", "zh"]


def synth_corpus(
    spark: SparkSession,
    n_docs: int,
    vocab: int = 2000,
    seed: int = 42,
    min_tokens: int = 5,
    max_tokens: int = 200,
    partitions: int | None = None,
) -> DataFrame:
    """-> (url, warc_ts, html, text, lang) + doc_id, deterministic."""
    rng = F.xxhash64  # 64-bit splittable hash as the PRNG
    base = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    span = max_tokens - min_tokens + 1
    n_tok = (F.pmod(rng(i, F.lit(seed), F.lit("len")), F.lit(span)) + min_tokens).cast("int")

    # token j of doc i: u ~ U[0,1) from hash; rank = floor(V^u) ~ 1/rank
    def tok(j):
        u = F.pmod(rng(i, j, F.lit(seed), F.lit("tok")), F.lit(1_000_000)) / F.lit(1_000_000.0)
        rank = F.floor(F.exp(u * F.log(F.lit(float(vocab))))).cast("long")
        return F.concat(F.lit("t"), rank.cast("string"))

    tokens = F.transform(F.sequence(F.lit(1), n_tok), tok)
    text = F.array_join(tokens, " ")
    lang = F.element_at(
        F.array(*[F.lit(x) for x in _LANGS]),
        (F.pmod(rng(i, F.lit(seed), F.lit("lang")), F.lit(len(_LANGS))) + 1).cast("int"),
    )
    url = F.concat(F.lit("synth://bench/"), i.cast("string"))
    html = F.encode(
        F.concat(
            F.lit("<html><head><title>"), url,
            F.lit("</title></head><body><p>"), text, F.lit("</p></body></html>"),
        ),
        "UTF-8",
    )
    return base.select(
        i.alias("doc_id"),
        url.alias("url"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(secs=i.cast("double"))).alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def synth_topical_corpus(
    spark: SparkSession,
    n_docs: int,
    vocab: int = 1000,
    n_sites: int = 16,
    zipf_tokens: int = 12,
    site_tokens: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Zipf corpus with TOPICAL LOCALITY: doc ids are crawl-ordered, and
    each contiguous run of ``n_docs/n_sites`` docs (a "site" / crawl
    segment) carries its own marker term ``s<g>`` alongside the global
    Zipf vocabulary.  Site terms are head-sized (df = docs per site) but
    live only in their segment's doc-id range — the posting-list shape
    real web corpora have (Common-Crawl pages arrive grouped by site and
    segment) and the one block-range-aligned WAND bounds exploit: an
    adversarial iid corpus makes every block look alike, a crawl-ordered
    one does not.  -> (doc_id, text); deterministic, pure JVM."""
    rng = F.xxhash64
    base = spark.range(
        0, n_docs, 1, spark.sparkContext.defaultParallelism
    )
    i = F.col("id")

    def tok(j):
        u = F.pmod(rng(i, j, F.lit(seed), F.lit("tok")), F.lit(1_000_000)) / F.lit(
            1_000_000.0
        )
        rank = F.floor(F.exp(u * F.log(F.lit(float(vocab))))).cast("long")
        return F.concat(F.lit("t"), rank.cast("string"))

    zipf = F.transform(F.sequence(F.lit(1), F.lit(zipf_tokens)), tok)
    site = (i / F.lit(max(1, n_docs // n_sites))).cast("long")
    n_site_tok = (
        F.pmod(rng(i, F.lit(seed), F.lit("stf")), F.lit(site_tokens)) + 1
    ).cast("int")
    site_run = F.array_repeat(
        F.concat(F.lit("s"), site.cast("string")), n_site_tok
    )
    text = F.array_join(F.concat(zipf, site_run), " ")
    return base.select(i.alias("doc_id"), text.alias("text"))
