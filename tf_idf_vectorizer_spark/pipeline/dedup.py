"""Deduplication operators for web-text corpora.

All hashing is md5-over-UTF-8 so results are reproducible across engines
(the DuckDB oracle computes the identical values).  MinHash uses the
lexicographic minimum of salted md5 hex digests — a valid permutation
family, and portable.

Scale notes (100 TB):
  * exact dedup is one hash-groupBy shuffle keyed by digest — uniform by
    construction, no skew;
  * MinHash signatures are one groupBy(doc) over the exploded distinct
    (doc, term) relation — same shuffle the TF build already does;
  * LSH banding self-joins on (band_idx, band_hash); bucket sizes are
    the only skew risk — near-duplicate clusters are genuinely hot keys,
    so the join is on the *bucket id* with a size cap pushed down before
    the pair explosion (cap_bucket) to bound the quadratic blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tf_idf_vectorizer_spark.functions.tokenize import tokenize


def _md5(col):
    return F.md5(F.encode(col, "UTF-8"))


def exact_duplicates(docs: DataFrame, key_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per duplicated text.
    -> (text_hash, n_docs, keep_doc_id)."""
    return (
        docs.select(key_col, _md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"), F.min(key_col).alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def dedup_keep_first(docs: DataFrame, key_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup survivors: the min-id doc per distinct text.
    -> (doc_id,)."""
    return (
        docs.select(key_col, _md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min(key_col).alias(key_col))
        .select(key_col)
    )


def _distinct_terms(docs: DataFrame, key_col: str, text_col: str) -> DataFrame:
    toks = tokenize(docs.select(key_col, text_col), text_col)
    return toks.select(key_col, F.explode("tokens").alias("term")).distinct()


def _distinct_shingles(
    docs: DataFrame, key_col: str, text_col: str, n: int
) -> DataFrame:
    """Distinct word n-gram (shingle) set per doc — the classic MinHash
    feature for near-dup detection (word order matters, unlike the
    unigram set).  Built-ins only: slice windows over the token array."""
    toks = tokenize(docs.select(key_col, text_col), text_col)
    windows = F.transform(
        F.sequence(F.lit(1), F.size("tokens") - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", F.slice(F.col("tokens"), i, n)),
    )
    sh = F.when(F.size("tokens") >= n, windows).otherwise(
        F.array().cast("array<string>")
    )
    return toks.select(key_col, F.explode(sh).alias("term")).distinct()


def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = 8,
    key_col: str = "doc_id",
    text_col: str = "text",
    shingle: int | None = None,
) -> DataFrame:
    """Per-doc MinHash signature; features are the unigram term set, or
    the word-``shingle``-gram set when ``shingle`` is given (the
    shingle -> minhash -> band -> bucket-join pipeline).
    sig_i = min over features of md5(feature || '#i').
    -> (doc_id, sig_0 .. sig_{n-1})."""
    terms = (
        _distinct_shingles(docs, key_col, text_col, shingle)
        if shingle
        else _distinct_terms(docs, key_col, text_col)
    )
    aggs = [
        F.min(_md5(F.concat(F.col("term"), F.lit(f"#{i}")))).alias(f"sig_{i}")
        for i in range(n_hashes)
    ]
    return terms.groupBy(key_col).agg(*aggs)


def lsh_candidate_pairs(
    docs: DataFrame,
    n_bands: int = 4,
    rows_per_band: int = 2,
    key_col: str = "doc_id",
    text_col: str = "text",
    cap_bucket: int = 1000,
    shingle: int | None = None,
) -> DataFrame:
    """MinHash-LSH: band the signature, bucket-join, emit candidate
    pairs (a < b).  ``shingle=n`` switches the feature set to word
    n-grams (shingle -> minhash -> band -> bucket-join).
    -> (doc_a, doc_b)."""
    n_hashes = n_bands * rows_per_band
    sigs = minhash_signatures(docs, n_hashes, key_col, text_col, shingle)
    bands = []
    for bi in range(n_bands):
        cols = [F.col(f"sig_{bi * rows_per_band + r}") for r in range(rows_per_band)]
        bands.append(
            sigs.select(
                F.col(key_col),
                F.lit(bi).alias("band"),
                F.md5(F.encode(F.concat_ws("|", *cols), "UTF-8")).alias("bhash"),
            )
        )
    banded = bands[0]
    for b in bands[1:]:
        banded = banded.unionByName(b)
    # cap pathological buckets before the quadratic pair join
    sizes = banded.groupBy("band", "bhash").agg(F.count("*").alias("bn"))
    banded = banded.join(
        sizes.filter(F.col("bn") <= cap_bucket).select("band", "bhash"),
        ["band", "bhash"],
    )
    a = banded.select("band", "bhash", F.col(key_col).alias("doc_a"))
    b = banded.select("band", "bhash", F.col(key_col).alias("doc_b"))
    return (
        a.join(b, ["band", "bhash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.2,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unigram-set Jaccard for all candidate pairs sharing >=1 term.
    -> (doc_a, doc_b, jaccard).  Quadratic — gate by doc count upstream
    or run on LSH candidates at scale."""
    terms = _distinct_terms(docs, key_col, text_col)
    sizes = terms.groupBy(key_col).agg(F.count("*").alias("sz"))
    a = terms.select(F.col(key_col).alias("doc_a"), "term")
    b = terms.select(F.col(key_col).alias("doc_b"), "term")
    common = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col(key_col).alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(key_col).alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("common").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


_HEX_HIGH = ["8", "9", "a", "b", "c", "d", "e", "f"]


def simhash16(docs: DataFrame, key_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """16-bit SimHash over the unigram term set: bit j is set when more
    terms hash with nibble j's high bit set than not (md5 hex nibble).
    Cross-engine portable (md5 + substring only).  -> (doc_id, simhash)."""
    terms = _distinct_terms(docs, key_col, text_col).withColumn(
        "h", _md5(F.col("term"))
    )
    bit_cols = [
        F.sum(
            F.when(
                F.substring("h", j + 1, 1).isin(_HEX_HIGH), F.lit(1)
            ).otherwise(F.lit(-1))
        ).alias(f"b{j}")
        for j in range(16)
    ]
    votes = terms.groupBy(key_col).agg(*bit_cols)
    sim = None
    for j in range(16):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = bit if sim is None else (sim + bit)
    return votes.select(key_col, sim.cast("long").alias("simhash"))


def embedding_near_dup(
    emb: DataFrame,
    threshold: float = 0.95,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above threshold, DEFAULT
    scale path: candidates restricted to a deterministic sign-pattern
    LSH bucket (equi-join on the bucket id — no CartesianProduct in the
    plan; candidate volume ~ Σ bucket² instead of corpus²), then exact
    cosine verification inside the bucket.  Near-identical vectors agree
    on sign bits except where a component sits near zero, so recall is
    high at near-dup thresholds; ``embedding_near_dup_exact`` is the
    all-pairs verifier when completeness matters more than scale.
    -> (id_a, id_b, cosine)."""
    from tf_idf_vectorizer_spark.pipeline.similarity import (
        dot_expr,
        norm_expr,
        sign_bucket_expr,
    )

    # norms computed ONCE per row below the join (bit-identical to the
    # inline cosine_expr, which would recompute both per PAIR)
    bucketed = emb.select(
        F.col(key_col),
        F.col(vec_col),
        norm_expr(vec_col).alias("nrm"),
        sign_bucket_expr(vec_col, n_bits).alias("bucket"),
    )
    a = bucketed.select(
        F.col(key_col).alias("id_a"), F.col(vec_col).alias("va"),
        F.col("nrm").alias("na"), "bucket",
    )
    b = bucketed.select(
        F.col(key_col).alias("id_b"), F.col(vec_col).alias("vb"),
        F.col("nrm").alias("nb"), "bucket",
    )
    pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        (dot_expr("va", "vb") / (F.col("na") * F.col("nb"))).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)


def embedding_near_dup_exact(
    emb: DataFrame,
    threshold: float = 0.95,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs exact verifier (quadratic crossJoin — bound the input;
    use the bucketed ``embedding_near_dup`` at scale)."""
    from tf_idf_vectorizer_spark.pipeline.similarity import cosine_expr

    a = emb.select(F.col(key_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(key_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a", "id_b", cosine_expr("va", "vb").alias("cosine")
    ).filter(F.col("cosine") >= threshold)
