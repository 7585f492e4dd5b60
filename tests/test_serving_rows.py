"""In-memory serving surface parity: similarity_rows (all four
reference scorers, scoring.rs:17-33) and search_rows (boolean search,
scoring.rs:191-206) must return exactly what the distributed
DataFrame paths return — the LRU-resident fast path is invisible in
results."""

from __future__ import annotations

from collections import Counter

import pytest

from tf_idf_vectorizer_spark.config import EngineConfig
from tf_idf_vectorizer_spark.operators.index_build import build_index
from tf_idf_vectorizer_spark.query.ast import parse_sexpr
from tf_idf_vectorizer_spark.query.packed import PackedIndex
from tf_idf_vectorizer_spark.sources.synth import synth_topical_corpus

CFG = EngineConfig(n_salts=4, block_size=64, term_buckets=16)


@pytest.fixture(scope="module")
def srv(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("srv") / "idx")
    docs = synth_topical_corpus(spark, 4000, vocab=300, n_sites=4, seed=31)
    build_index(spark, docs, out, config=CFG, norms=True)
    return PackedIndex(spark, out, CFG, warm=True)


def _df_rows(df):
    return [
        (r["doc_id"], round(r["score"], 9), r["doc_len"]) for r in df.collect()
    ]


def _norm(rows):
    return [(d, round(s, 9), l) for d, s, l in rows]


@pytest.mark.parametrize("algo", ["contains", "dot", "cosine", "bm25"])
def test_similarity_rows_parity(srv, algo):
    for terms in (
        ["t1", "t2"],
        Counter({"t1": 2, "s2": 1}),
        ["s0", "s3"],
        ["missing_term"],
    ):
        got = _norm(srv.similarity_rows(algo, terms, k=12))
        want = _df_rows(srv.similarity(algo, terms, k=12))
        assert got == want, (algo, terms)


BOOLS = [
    '(and "t1" "t2")',
    '(or "t1" (not "t2"))',
    '(not "t1")',
    '(and "s1" (or "t3" "t4"))',
    "(all)",
    "(none)",
]


@pytest.mark.parametrize("q", BOOLS)
def test_search_rows_parity(srv, q):
    query = parse_sexpr(q)
    got = _norm(srv.search_rows(query, k=12))
    want = _df_rows(srv.bm25_search(query, k=12))
    assert got == want, q


def test_rows_apis_job_free_when_resident(srv, spark):
    """Once the vocabulary is resident, the serving calls run no Spark
    jobs at all (tracked via the status tracker's job ids)."""
    srv.similarity_rows("dot", ["t1", "t2"], k=5)
    srv.search_rows(parse_sexpr('(and "t1" "t2")'), k=5)
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    srv.similarity_rows("dot", ["t1", "t2"], k=5)
    srv.similarity_rows("cosine", ["t1", "t2"], k=5)
    srv.similarity_rows("contains", ["t1"], k=5)
    srv.search_rows(parse_sexpr('(and "t1" (not "t2"))'), k=5)
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "serving calls must not launch Spark jobs"
