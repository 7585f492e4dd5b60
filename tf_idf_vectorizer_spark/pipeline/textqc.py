"""Text analysis / quality operators for training-data pipelines:
language-ID heuristic, quality scoring, token counting, fingerprinting.

Everything is built-in-function expressions (codegen'd, shuffle only
where a per-doc aggregate over exploded terms is needed).  Formulas are
fixed and documented so the DuckDB oracle reproduces them bit-for-bit
(floats rounded at the gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tf_idf_vectorizer_spark.functions.tokenize import tokenize

EN_STOPWORDS = ["the", "of", "and", "to", "a", "in", "is", "it"]


def token_counts(docs: DataFrame, key_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (doc_id, n_tokens, n_chars_seen): whitespace token count plus
    character count of the raw text."""
    t = tokenize(docs.select(key_col, text_col), text_col)
    return t.select(
        key_col,
        F.size("tokens").alias("n_tokens"),
        F.length(text_col).alias("n_chars_seen"),
    )


def quality_scores(
    docs: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Composite quality score in [0,1]:
        0.4 * min(n_tokens/100, 1)          (length)
      + 0.3 * (1 - stopword_ratio)          (information density)
      + 0.3 * min(mean_token_len/8, 1)      (vocabulary richness proxy)
    -> (doc_id, n_tokens, stop_ratio, mean_tok_len, quality)."""
    t = tokenize(docs.select(key_col, text_col), text_col)
    stops = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_tok = F.size("tokens")
    n_stop = F.size(F.filter("tokens", lambda x: F.array_contains(stops, x)))
    tok_len_sum = F.aggregate(
        F.transform("tokens", lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    out = t.select(
        key_col,
        n_tok.alias("n_tokens"),
        (n_stop.cast("double") / n_tok.cast("double")).alias("stop_ratio"),
        (tok_len_sum.cast("double") / n_tok.cast("double")).alias("mean_tok_len"),
    )
    quality = (
        F.lit(0.4) * F.least(F.col("n_tokens").cast("double") / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.col("stop_ratio"))
        + F.lit(0.3) * F.least(F.col("mean_tok_len") / F.lit(8.0), F.lit(1.0))
    )
    return out.withColumn("quality", quality)


def lang_id(docs: DataFrame, key_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """N-gram-free language heuristic: classify 'en' when the English
    stop-word token ratio exceeds 5%, else 'unk'.  (A real model slots
    in as a pandas UDF; the classifier contract — deterministic label
    per doc — is what downstream filtering depends on.)
    -> (doc_id, pred_lang, stop_ratio)."""
    t = tokenize(docs.select(key_col, text_col), text_col)
    stops = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_tok = F.size("tokens")
    n_stop = F.size(F.filter("tokens", lambda x: F.array_contains(stops, x)))
    ratio = F.when(n_tok > 0, n_stop.cast("double") / n_tok.cast("double")).otherwise(
        F.lit(0.0)
    )
    return t.select(
        key_col,
        F.when(ratio > 0.05, F.lit("en")).otherwise(F.lit("unk")).alias("pred_lang"),
        ratio.alias("stop_ratio"),
    )


def doc_fingerprints(
    docs: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Order-insensitive document fingerprint: (min md5 over distinct
    terms, distinct-term count, full-text md5).  The md5-min is a 1-hash
    MinHash; the text hash is the exact-dup key.
    -> (doc_id, fp_min, n_distinct, text_hash)."""
    t = tokenize(docs.select(key_col, text_col), text_col)
    terms = t.select(
        key_col,
        F.col(text_col),
        F.explode_outer("tokens").alias("term"),
    )
    return terms.groupBy(key_col).agg(
        F.min(F.md5(F.encode(F.col("term"), "UTF-8"))).alias("fp_min"),
        F.count_distinct(F.col("term")).alias("n_distinct"),
        F.first(F.md5(F.encode(F.col(text_col), "UTF-8"))).alias("text_hash"),
    )
