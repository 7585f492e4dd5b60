"""Tokenization and per-document term frequencies.

The reference crate treats tokenization as external (its harness used the
sudachi tokenizer — /root/reference/doc-search-test.md:8-9) and ingests a
``TermFrequency`` map per document (src/vectorizer/term.rs:32-36).  Our
tokenizer is whitespace splitting — the synthetic web-text corpus is
space-separated tokens — expressed entirely with built-in functions so it
stays inside WholeStageCodegen; a pandas-UDF hook exists for pluggable
real tokenizers.

``term_frequencies`` is the reference's add_doc TF build
(src/vectorizer/mod.rs:118-181 step 2): one row per (doc, term) with the
count, which is the row-per-posting layout every downstream operator uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"


def tokenize_udf(tokenizer=None):
    """Pluggable tokenizer as an Arrow-vectorized pandas UDF — the slot
    where a real tokenizer (sudachi in the reference's harness,
    doc-search-test.md:8-9) goes.  Default: whitespace split, identical
    output to the built-in `tokenize` (tested).

    Returns a column function: df.withColumn("tokens", tok(F.col("text"))).
    """
    from pyspark.sql.types import ArrayType, StringType

    fn = tokenizer or (lambda s: s.split())

    # no type hints: pandas_udf tries to resolve stringified annotations
    # (PEP 563) and rejects them; pass the return type explicitly
    def kernel(texts):
        return texts.map(lambda t: fn(t) if t is not None else [])

    return F.pandas_udf(kernel, ArrayType(StringType()))


def tokenize(df: DataFrame, text_col: str = "text", out_col: str = "tokens") -> DataFrame:
    """text -> array<string> of tokens (JVM-side split, empty-safe)."""
    toks = F.split(F.trim(F.col(text_col)), TOKEN_SPLIT_RE)
    # trim('') splits to [''] — normalize to an empty array
    toks = F.filter(toks, lambda t: t != F.lit(""))
    return df.withColumn(out_col, toks)


def term_frequencies(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    with_doc_len: bool = False,
) -> DataFrame:
    """-> (key_col, term string, tf long): the reference TermFrequency map
    flattened to rows.  Partial (map-side) aggregation is free: Catalyst
    plans HashAggregate(partial) -> shuffle(key, term) -> HashAggregate.

    with_doc_len=True rides the document length (token count, known
    before the explode) through the aggregation as first(doc_len) —
    downstream consumers that need (tf, doc_len) per posting avoid a
    doc-keyed join/shuffle entirely.
    """
    toks = tokenize(df.select(key_col, text_col), text_col)
    if with_doc_len:
        exploded = toks.select(
            key_col,
            F.size("tokens").cast("long").alias("doc_len"),
            F.explode("tokens").alias("term"),
        )
        return exploded.groupBy(key_col, "term").agg(
            F.count("*").alias("tf"), F.first("doc_len").alias("doc_len")
        )
    exploded = toks.select(key_col, F.explode("tokens").alias("term"))
    return exploded.groupBy(key_col, "term").agg(F.count("*").alias("tf"))
