"""Non-trivial tokenizer kernels for the pluggable tokenizer slot.

The reference crate leaves tokenization external — its evaluation harness
ran sudachi morphological analysis, C mode then A mode
(/root/reference/doc-search-test.md:8-9) — and ingests a per-doc count
map (term.rs:32-36).  sudachi (and its dictionaries) are not available
here, so this module provides the standard public fallback for CJK text
(the Lucene CJKAnalyzer idiom): lowercase latin/digit word runs plus
CHARACTER BIGRAMS over CJK script runs (a length-1 run yields its single
character).  Token ORDER is unspecified — every consumer aggregates to a
count map, exactly like the reference's TermFrequency.

Two byte-identical implementations, parity-tested:

  * :func:`tokenize_cjk_expr` — pure Catalyst expressions
    (regexp_extract_all + transform/substr), fully codegen'd: the build
    hot path stays JVM-side (no Arrow boundary), same design choice as
    the varint codec (operators/index_build.py).
  * :func:`tokenize_cjk_py` — the plain-Python twin, usable directly in
    the ``tokenize_udf`` pandas-UDF slot (functions/tokenize.py:24) and
    as the oracle in tests.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Hiragana, Katakana, CJK ext A, CJK unified — one run regex shared by
# both implementations (character-class literals, identical semantics in
# Java and Python regex engines)
CJK_RUN = "[぀-ヿ㐀-䶿一-鿿]+"
WORD_RUN = "[a-z0-9]+"

_WORD_RE = re.compile(WORD_RUN)
_CJK_RE = re.compile(CJK_RUN)


def tokenize_cjk_py(text: str | None) -> list[str]:
    """Python twin of :func:`tokenize_cjk_expr` (multiset-identical)."""
    if not text:
        return []
    t = text.lower()
    out = _WORD_RE.findall(t)
    for run in _CJK_RE.findall(t):
        if len(run) == 1:
            out.append(run)
        else:
            out.extend(run[i : i + 2] for i in range(len(run) - 1))
    return out


def tokenize_cjk_expr(text: Column) -> Column:
    """text -> array<string> of (latin word | CJK bigram) tokens, pure
    Catalyst expressions — WholeStageCodegen end to end."""
    t = F.lower(text)
    words = F.regexp_extract_all(t, F.lit(f"({WORD_RUN})"), 1)
    runs = F.regexp_extract_all(t, F.lit(f"({CJK_RUN})"), 1)
    bigrams = F.flatten(
        F.transform(
            runs,
            lambda r: F.when(F.length(r) == 1, F.array(r)).otherwise(
                F.transform(
                    F.sequence(F.lit(1), F.length(r) - 1),
                    lambda i: r.substr(i, F.lit(2)),
                )
            ),
        )
    )
    return F.concat(words, bigrams)


def tokens_expr(tokenizer: str | None, text: Column) -> Column:
    """text -> array<string> of tokens under the named tokenizer — the
    single expression both term_frequencies and doc-length computations
    derive from, so ``doc_len == sum(tf)`` holds by construction."""
    if tokenizer in (None, "ws", "whitespace"):
        from tf_idf_vectorizer_spark.functions.tokenize import TOKEN_SPLIT_RE

        toks = F.split(F.trim(text), TOKEN_SPLIT_RE)
        return F.filter(toks, lambda t: t != F.lit(""))
    if tokenizer == "cjk":
        return tokenize_cjk_expr(text)
    raise ValueError(f"unknown tokenizer {tokenizer!r} (ws|cjk)")


def doc_len_expr(tokenizer: str | None, text: Column) -> Column:
    """text -> token count (long, 0 for null/empty): the document length
    WITHOUT tokenize->explode->groupBy — a narrow projection over the
    corpus instead of a full shuffle of every posting row (guide §2.4:
    remove shuffles outright).  Exactly sum(tf) by construction."""
    return F.coalesce(
        F.size(tokens_expr(tokenizer, text)).cast("long"), F.lit(0).cast("long")
    )


def tf_function(tokenizer: str | None):
    """Dispatch a tokenizer name (recorded in the index meta, so
    incremental batches tokenize exactly like the build) to its
    term_frequencies implementation."""
    from tf_idf_vectorizer_spark.functions.tokenize import term_frequencies

    if tokenizer in (None, "ws", "whitespace"):
        return term_frequencies
    if tokenizer == "cjk":
        return term_frequencies_cjk
    raise ValueError(f"unknown tokenizer {tokenizer!r} (ws|cjk)")


def term_frequencies_cjk(df, key_col: str = "doc_id", text_col: str = "text",
                         with_doc_len: bool = False):
    """term_frequencies (functions/tokenize.py:52) under the CJK
    tokenizer: same (key, term, tf [, doc_len]) contract, so the whole
    engine — build_index included — runs unchanged on top of it."""
    toks = df.select(
        key_col, tokenize_cjk_expr(F.col(text_col)).alias("tokens")
    )
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
