"""The reference's own examples/basic.rs scenario, end to end:
add doc1, add doc2, DELETE doc1, add doc3, then cosine-search
AND("柔軟","安全") under the f16 engine.

Published expected output (README.md:92-102): exactly ONE hit — doc2,
doc_len 4.  NOTE the README's score (0.768706) was captured on
v0.10.0 (the build log in the README says so); the CURRENT code at
/root/reference (v0.10.5, scoring_cosine at scoring.rs:341-407) yields
~0.904545 for this scenario — verified by hand against the source:
dot = 2, norm_q = sqrt(2), norm_d = sqrt((1*2/3)^2 + 1 + 1).  We pin
hit membership/doc_len to the published output and the score to the
current-source formula.
"""

from __future__ import annotations

import math

import pytest

from tf_idf_vectorizer_spark.config import EngineConfig
from tf_idf_vectorizer_spark.operators.index_build import build_index
from tf_idf_vectorizer_spark.oracle import OracleIndex
from tf_idf_vectorizer_spark.query.ast import Query
from tf_idf_vectorizer_spark.query.exact import ExactSearcher
from tf_idf_vectorizer_spark.streaming import IncrementalIndex

FREQ1 = "rust 高速 並列 rust"   # add_terms(["rust","高速","並列","rust"])
FREQ2 = "rust 柔軟 安全 rust"

# hand-computed from the CURRENT reference source (see module docstring)
EXPECTED_SCORE = 2.0 / (math.sqrt(2.0) * math.sqrt((2.0 / 3.0) ** 2 + 2.0))


def test_oracle_matches_current_reference_source():
    oracle = OracleIndex({"doc2": FREQ2, "doc3": FREQ1}, EngineConfig(dtype="f16"))
    q = Query.and_(Query.term("柔軟"), Query.term("安全"))
    hits = oracle.search("cosine", q)
    assert len(hits) == 1
    key, score, dl = hits[0]
    assert key == "doc2" and dl == 4
    assert math.isclose(score, EXPECTED_SCORE, rel_tol=1e-4)


def test_spark_exact_path_reproduces_scenario(spark):
    docs = spark.createDataFrame(
        [(2, FREQ2), (3, FREQ1)], "doc_id long, text string"
    )
    s = ExactSearcher(spark, docs, config=EngineConfig(dtype="f16"), cache=False)
    q = Query.and_(Query.term("柔軟"), Query.term("安全"))
    hits = s.search("cosine", q).collect()
    assert len(hits) == 1
    assert hits[0]["doc_id"] == 2 and hits[0]["doc_len"] == 4
    assert math.isclose(hits[0]["score"], EXPECTED_SCORE, rel_tol=1e-4)


def test_incremental_add_del_readd_flow(spark, tmp_path):
    """The exact mutation sequence of examples/basic.rs through the
    incremental index: add doc1+doc2, delete doc1, add doc3 — then a
    BM25 query sees exactly the {doc2, doc3} state."""
    cfg = EngineConfig(n_salts=2, block_size=64, term_buckets=8)
    out = str(tmp_path / "basic")
    base = spark.createDataFrame(
        [(1, FREQ1), (2, FREQ2)], "doc_id long, text string"
    )
    build_index(spark, base, out, config=cfg)
    inc = IncrementalIndex(spark, out, cfg)
    inc.apply_batch(delete_ids=[1])
    inc.apply_batch(
        adds=spark.createDataFrame([(3, FREQ1)], "doc_id long, text string")
    )

    from tf_idf_vectorizer_spark.query.packed import PackedIndex

    idx = PackedIndex(spark, out, cfg)
    # AND(柔軟, 安全) candidates == {doc2}; doc1 must be gone
    from tf_idf_vectorizer_spark.query.ast import parse_sexpr

    hits = idx.bm25_search(parse_sexpr('(and "柔軟" "安全")'), k=10).collect()
    assert [r["doc_id"] for r in hits] == [2]
    # stats equal a fresh build of the final state
    import json

    fresh = str(tmp_path / "fresh")
    build_index(
        spark,
        spark.createDataFrame([(2, FREQ2), (3, FREQ1)], "doc_id long, text string"),
        fresh,
        config=cfg,
    )
    mi, mf = (json.load(open(f"{p}/meta.json")) for p in (out, fresh))
    assert (mi["doc_num"], mi["total_len"], mi["n_terms"]) == (
        mf["doc_num"], mf["total_len"], mf["n_terms"],
    )
