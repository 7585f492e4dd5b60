"""Golden-parity tests: Spark exact path vs the pure-Python oracle that
implements the reference formulas (SURVEY.md §5 layer (b))."""

import math

import pytest

from tf_idf_vectorizer_spark.oracle import OracleIndex
from tf_idf_vectorizer_spark.query.ast import Query, parse_sexpr
from tf_idf_vectorizer_spark.query.exact import ExactSearcher
from tf_idf_vectorizer_spark.sources import load_documents

QUERIES = [
    # (name, s-expression)  — mirrors FIXTURES.md §2 required shapes
    ("single_rare", '"vectorizer"'),
    ("single_head", '"the"'),
    ("and3", '(and "spark" "join" "query")'),
    ("or3", '(or "spark" "join" "merge")'),
    ("not1", '(not "the")'),
    ("nested", '(and "spark" (or "join" (not "slow")))'),
    ("all", "(all)"),
    ("none", "(none)"),
    ("oov", '(or "spark" "zzz_not_a_term")'),
]


@pytest.fixture(scope="module")
def corpus(spark, sf_smoke):
    docs = load_documents(spark, sf_smoke)
    rows = docs.select("doc_id", "text").collect()
    oracle = OracleIndex({r["doc_id"]: r["text"] for r in rows})
    searcher = ExactSearcher(spark, docs, key_col="doc_id")
    return oracle, searcher


def _assert_rank_identical(spark_rows, oracle_hits, tol=1e-6):
    got = [(r["doc_id"], r["score"], r["doc_len"]) for r in spark_rows]
    assert [g[0] for g in got] == [o[0] for o in oracle_hits], (
        f"doc order mismatch: {got[:5]} vs {oracle_hits[:5]}"
    )
    for g, o in zip(got, oracle_hits):
        assert math.isclose(g[1], o[1], rel_tol=tol, abs_tol=1e-12), (g, o)
        assert g[2] == o[2], (g, o)


@pytest.mark.parametrize("algo", ["bm25", "cosine", "dot", "contains"])
@pytest.mark.parametrize("qname,expr", QUERIES)
def test_search_parity(corpus, algo, qname, expr):
    oracle, searcher = corpus
    q = parse_sexpr(expr)
    k = 20
    expected = oracle.search(algo, q, k=k)
    got = searcher.search(algo, q, k=k).collect()
    tol = 1e-4 if algo == "cosine" else 1e-6  # f32 accumulation order
    _assert_rank_identical(got, expected, tol=tol)


def test_freetext_duplicate_terms(corpus):
    """Dot/cosine honor query multiplicity; BM25 ignores it."""
    oracle, searcher = corpus
    terms = ["spark", "spark", "join"]
    for algo in ["dot", "cosine", "bm25"]:
        expected = oracle.similarity(algo, terms, k=15)
        got = searcher.similarity(algo, terms, k=15).collect()
        tol = 1e-4 if algo == "cosine" else 1e-6
        _assert_rank_identical(got, expected, tol=tol)


def test_bm25_ignores_multiplicity(corpus):
    oracle, _ = corpus
    a = oracle.similarity("bm25", ["spark", "join"], k=10)
    b = oracle.similarity("bm25", ["spark", "spark", "join"], k=10)
    assert a == b


def test_not_query_scores_zero(corpus):
    """!X yields score 0.0 for docs lacking the term (doc-search-test.md:145-178)."""
    oracle, searcher = corpus
    q = Query.not_(Query.term("the"))
    got = searcher.search("bm25", q, k=5).collect()
    assert all(r["score"] == 0.0 for r in got)
    expected = oracle.search("bm25", q, k=5)
    _assert_rank_identical(got, expected)
