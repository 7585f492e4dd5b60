"""f16 quantization-chain parity (the reference's DEFAULT engine) and
boolean search over the packed index."""

from __future__ import annotations

import math

import numpy as np
import pytest

from tf_idf_vectorizer_spark.config import EngineConfig
from tf_idf_vectorizer_spark.operators.index_build import build_index
from tf_idf_vectorizer_spark.oracle import OracleIndex
from tf_idf_vectorizer_spark.query.ast import parse_sexpr
from tf_idf_vectorizer_spark.query.exact import ExactSearcher
from tf_idf_vectorizer_spark.query.packed import PackedIndex
from tf_idf_vectorizer_spark.sources import load_documents


def test_f16_roundtrip_chain():
    """sqrt -> f16 -> square -> truncate (tfidf.rs:79-91): spot values."""
    cfg = EngineConfig(dtype="f16")
    counts = np.array([1, 2, 3, 4, 9, 100, 10000, 123456])
    eff = cfg.roundtrip_tf(counts)
    # 1,4,9 are perfect squares of exactly-representable roots
    assert eff[0] == 1 and eff[3] == 4 and eff[4] == 9
    # f16(sqrt(2))^2 = 1.9995...^2 -> truncates to 1 (lossy, by design)
    assert eff[1] == int(np.float32(np.float16(np.sqrt(2.0))) ** 2)
    # large counts lose precision but stay monotone-ish
    assert eff[7] > eff[6] > eff[5]


@pytest.mark.parametrize("dtype", ["f16", "u16", "u32"])
def test_quantized_engine_parity(spark, sf_smoke, dtype):
    """Spark exact path == oracle under each quantized engine config."""
    cfg = EngineConfig(dtype=dtype)
    docs = load_documents(spark, sf_smoke)
    rows = docs.select("doc_id", "text").collect()
    oracle = OracleIndex({r["doc_id"]: r["text"] for r in rows}, cfg)
    searcher = ExactSearcher(spark, docs, config=cfg)
    for algo in ["bm25", "cosine", "dot"]:
        expected = oracle.similarity(algo, ["spark", "join", "the"], k=15)
        got = searcher.similarity(algo, ["spark", "join", "the"], k=15).collect()
        assert [r["doc_id"] for r in got] == [e[0] for e in expected], (algo, dtype)
        tol = 1e-3 if algo == "cosine" else 1e-6
        for g, e in zip(got, expected):
            assert math.isclose(g["score"], e[1], rel_tol=tol, abs_tol=1e-9), (
                algo, dtype, g, e,
            )


BOOL_QUERIES = [
    '(and "spark" "join")',
    '(or "spark" "merge")',
    '(not "the")',
    '(and "spark" (or "join" (not "slow")))',
    "(all)",
    "(none)",
]


@pytest.fixture(scope="module")
def packed(spark, sf_smoke, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pbool") / "idx")
    docs = load_documents(spark, sf_smoke)
    cfg = EngineConfig(n_salts=4, block_size=64, term_buckets=16)
    build_index(spark, docs, out, config=cfg)
    return PackedIndex(spark, out, cfg), ExactSearcher(spark, docs)


@pytest.mark.parametrize("expr", BOOL_QUERIES)
def test_packed_bool_search_matches_exact(packed, expr):
    idx, searcher = packed
    q = parse_sexpr(expr)
    got = idx.bm25_search(q, k=20).collect()
    want = searcher.search("bm25", q, k=20).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want], expr
    for g, w in zip(got, want):
        assert math.isclose(g["score"], w["score"], rel_tol=1e-9, abs_tol=1e-12)
        assert g["doc_len"] == w["doc_len"]
