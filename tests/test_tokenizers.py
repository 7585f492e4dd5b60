"""A real (non-whitespace) tokenizer through the pluggable slot.

The reference harness tokenized Japanese Wikipedia with sudachi
(/root/reference/doc-search-test.md:8-9); sudachi is unavailable here,
so the engine ships the standard public CJK fallback (latin word runs +
CJK character bigrams).  Tested:

  1. the Catalyst-expression kernel == the pure-Python twin (multiset
     parity, property-tested over generated mixed-script text);
  2. build_index(tokenizer='cjk') + BM25 query is rank-identical to the
     pure-Python oracle running the SAME tokenizer — end-to-end
     correctness under a non-whitespace tokenizer on Japanese text;
  3. an incremental batch on a cjk-tokenized index tokenizes with the
     build's tokenizer (recorded in meta) and equals a fresh build;
  4. the pandas-UDF slot (tokenize_udf) accepts the Python kernel.
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tf_idf_vectorizer_spark.config import EngineConfig
from tf_idf_vectorizer_spark.functions.tokenize import tokenize_udf
from tf_idf_vectorizer_spark.functions.tokenizers import (
    term_frequencies_cjk,
    tf_function,
    tokenize_cjk_expr,
    tokenize_cjk_py,
)
from tf_idf_vectorizer_spark.operators.index_build import build_index
from tf_idf_vectorizer_spark.oracle import OracleIndex
from tf_idf_vectorizer_spark.query.packed import PackedIndex

CFG = EngineConfig(n_salts=2, block_size=16, term_buckets=8)

JA_DOCS = [
    (0, "Rust は高速で安全なシステムプログラミング言語です"),
    (1, "検索エンジンは転置インデックスを使う"),
    (2, "日本語の形態素解析は難しい spark engine"),
    (3, "高速な全文検索エンジン Spark で構築する"),
    (4, "言語モデルとベクトル検索 rust rust"),
    (5, "ひらがな と カタカナ と 漢字"),
    (6, "a"),
    (7, "語"),
]


def _expr_tokens(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    rows = df.select(
        "id", tokenize_cjk_expr(F.col("text")).alias("toks")
    ).collect()
    return {r["id"]: list(r["toks"]) for r in rows}


def test_kernel_parity_fixed_cases(spark):
    texts = [t for _, t in JA_DOCS] + [
        "", "   ", "...!!!", "ABC-def_123", "漢", "ノー", "日本語テスト text",
        "カタカナひらがな漢字むすび", "x日y本z", "１２３ ＡＢＣ",  # fullwidth: not matched
    ]
    got = _expr_tokens(spark, texts)
    for i, t in enumerate(texts):
        assert Counter(got[i]) == Counter(tokenize_cjk_py(t)), t


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from(
                list("abzZ09 ._-,ひらがなカタカナ日本語検索漢字エンジン高速")
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_kernel_parity_property(spark, texts):
    got = _expr_tokens(spark, texts)
    for i, t in enumerate(texts):
        assert Counter(got[i]) == Counter(tokenize_cjk_py(t))


def test_bigram_semantics():
    assert tokenize_cjk_py("日本語") == ["日本", "本語"]
    assert tokenize_cjk_py("語") == ["語"]
    assert tokenize_cjk_py("Rust言語") == ["rust", "言語"]
    assert tokenize_cjk_py("") == []
    assert tokenize_cjk_py(None) == []


def test_build_and_query_cjk_vs_oracle(spark, tmp_path):
    out = str(tmp_path / "ja_idx")
    docs = spark.createDataFrame(JA_DOCS, "doc_id long, text string")
    meta = build_index(spark, docs, out, config=CFG, tokenizer="cjk")
    assert meta["tokenizer"] == "cjk"
    oracle = OracleIndex(dict(JA_DOCS), CFG, tokenize=tokenize_cjk_py)
    idx = PackedIndex(spark, out, CFG)
    for terms in (["検索"], ["言語", "rust"], ["日本", "本語", "spark"]):
        want = [
            (k, round(s, 9), dl)
            for k, s, dl in oracle.similarity("bm25", Counter(terms), k=8)
        ]
        for mode in ("exact", "wand", "driver"):
            got = [
                (r["doc_id"], round(r["score"], 9), r["doc_len"])
                for r in idx.bm25_topk(terms, k=8, mode=mode).collect()
            ]
            assert got == want, (terms, mode)


def test_incremental_batch_uses_build_tokenizer(spark, tmp_path):
    from tf_idf_vectorizer_spark.streaming.incremental import IncrementalIndex

    out = str(tmp_path / "ja_inc")
    base = JA_DOCS[:6]
    batch = [(6, "新しい検索ドキュメント"), (0, "上書き rust 言語")]
    final = dict(base)
    final.update(batch)
    build_index(
        spark,
        spark.createDataFrame(base, "doc_id long, text string"),
        out,
        config=CFG,
        tokenizer="cjk",
    )
    IncrementalIndex(spark, out, CFG).apply_batch(
        adds=spark.createDataFrame(batch, "doc_id long, text string")
    )
    fresh = str(tmp_path / "ja_fresh")
    build_index(
        spark,
        spark.createDataFrame(list(final.items()), "doc_id long, text string"),
        fresh,
        config=CFG,
        tokenizer="cjk",
    )
    for terms in (["検索"], ["言語", "rust"]):
        a = PackedIndex(spark, out, CFG).bm25_topk(terms, k=8, mode="exact")
        b = PackedIndex(spark, fresh, CFG).bm25_topk(terms, k=8, mode="exact")
        assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_udf_slot_accepts_python_kernel(spark):
    df = spark.createDataFrame(JA_DOCS, "doc_id long, text string")
    tok = tokenize_udf(tokenize_cjk_py)
    rows = df.select("doc_id", tok(F.col("text")).alias("toks")).collect()
    for r in rows:
        assert Counter(r["toks"]) == Counter(
            tokenize_cjk_py(dict(JA_DOCS)[r["doc_id"]])
        )


def test_tf_function_dispatch():
    from tf_idf_vectorizer_spark.functions.tokenize import term_frequencies

    assert tf_function(None) is term_frequencies
    assert tf_function("ws") is term_frequencies
    assert tf_function("cjk") is term_frequencies_cjk
    with pytest.raises(ValueError, match="unknown tokenizer"):
        tf_function("sudachi")
