"""Packed-index contains/dot/cosine parity with the exact path, and
batch multi-query == sequential single-query results."""

from __future__ import annotations

import math

import pytest

from tf_idf_vectorizer_spark.config import EngineConfig
from tf_idf_vectorizer_spark.operators.index_build import build_index
from tf_idf_vectorizer_spark.query.exact import ExactSearcher
from tf_idf_vectorizer_spark.query.packed import PackedIndex
from tf_idf_vectorizer_spark.sources import load_documents

CFG = EngineConfig(n_salts=4, block_size=64, term_buckets=16)


@pytest.fixture(scope="module")
def built(spark, sf_smoke, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ps") / "idx")
    docs = load_documents(spark, sf_smoke)
    build_index(spark, docs, out, config=CFG, norms=True)
    return PackedIndex(spark, out, CFG), ExactSearcher(spark, docs)


@pytest.mark.parametrize("algo", ["contains", "dot", "cosine"])
def test_packed_scorer_matches_exact(built, algo):
    idx, searcher = built
    terms = ["spark", "spark", "join"]  # multiplicity matters for dot/cosine
    got = idx.similarity(algo, terms, k=15).collect()
    want = searcher.similarity(algo, terms, k=15).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want], algo
    for g, w in zip(got, want):
        assert math.isclose(g["score"], w["score"], rel_tol=1e-6, abs_tol=1e-12)
        assert g["doc_len"] == w["doc_len"]


def test_cosine_requires_norms(spark, sf_smoke, tmp_path):
    out = str(tmp_path / "nonorm")
    build_index(spark, load_documents(spark, sf_smoke), out, config=CFG)
    idx = PackedIndex(spark, out, CFG)
    with pytest.raises(ValueError, match="norms=True"):
        idx.similarity("cosine", ["spark"], k=5)


def test_batch_equals_sequential(built):
    idx, _ = built
    queries = {
        0: ["spark", "join"],
        1: ["the"],
        2: ["merge", "query", "zzz_oov"],
        3: ["zzz_only_oov"],
    }
    batch = idx.bm25_topk_batch(queries, k=8).collect()
    by_q: dict = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, terms in queries.items():
        seq = idx.bm25_topk(terms, k=8, mode="exact").collect()
        got = sorted(by_q.get(qid, []), key=lambda r: (-r["score"], r["doc_id"]))
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in seq], qid
        for g, s in zip(got, seq):
            assert math.isclose(g["score"], s["score"], rel_tol=1e-9)


def test_batch_auto_splits_heavy_queries(spark, sf_smoke, tmp_path):
    """A WAND-territory query inside a batch peels off through the WAND
    path; results must match the plain distributed batch."""
    import math

    from tf_idf_vectorizer_spark.config import EngineConfig
    from tf_idf_vectorizer_spark.operators.index_build import build_index
    from tf_idf_vectorizer_spark.query.packed import PackedIndex
    from tf_idf_vectorizer_spark.sources import load_documents

    cfg = EngineConfig(n_salts=4, block_size=64, term_buckets=16)
    out = str(tmp_path / "bsplit")
    build_index(
        spark, load_documents(spark, sf_smoke).select("doc_id", "text"),
        out, config=cfg,
    )
    idx = PackedIndex(spark, out, cfg)
    idx.WAND_THRESHOLD = 300  # force 'the' (df~450) into WAND territory
    queries = {0: ["spark", "join"], 1: ["the"], 2: ["merge", "query"]}
    got = idx.bm25_topk_batch(queries, k=10, mode="auto").collect()
    want = idx.bm25_topk_batch(queries, k=10, mode="exact").collect()
    key = lambda r: (r["query_id"], r["doc_id"])  # noqa: E731
    got_s, want_s = sorted(got, key=key), sorted(want, key=key)
    assert [key(r) for r in got_s] == [key(r) for r in want_s]
    for a, b in zip(got_s, want_s):
        assert math.isclose(a["score"], b["score"], rel_tol=1e-9)
