"""WAND in its own regime: the round-3 planner features — tight
pack-time bounds, sparse-term postings-level pruning, the driver
rescore, and the crawl-ordered (topical) corpus shape — all while
staying rank-identical to the exact path and the pure-Python oracle.

Reference pruning contract: block-max pruning must not change the
top-k (scoring.rs:410-435 computes exact BM25; WAND is our scale
addition and must be invisible in results)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tf_idf_vectorizer_spark.config import EngineConfig
from tf_idf_vectorizer_spark.operators.index_build import build_index
from tf_idf_vectorizer_spark.oracle import OracleIndex
from tf_idf_vectorizer_spark.query.packed import PackedIndex
from tf_idf_vectorizer_spark.sources.synth import synth_topical_corpus

CFG = EngineConfig(n_salts=4, block_size=64, term_buckets=16)


@pytest.fixture(scope="module")
def topical(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("regime") / "topical")
    docs = synth_topical_corpus(
        spark, 6000, vocab=500, n_sites=8, seed=11
    ).cache()
    build_index(spark, docs, out, config=CFG)
    oracle = OracleIndex({r["doc_id"]: r["text"] for r in docs.collect()})
    return PackedIndex(spark, out, CFG), oracle


def _rows(df):
    return [
        (r["doc_id"], round(r["score"], 9), r["doc_len"]) for r in df.collect()
    ]


QUERIES = [
    ["t1"],                      # head, single term -> doc-disjoint prune
    ["s3"],                      # site term: one contiguous range
    ["t1", "s2", "s6"],          # head + two site segments
    ["t1", "t2", "s5"],          # the wand8m bench shape
    ["t2", "t3"],                # two heads, no locality (escape path)
]


@pytest.mark.parametrize("terms", QUERIES, ids=["head1", "site", "h2s", "hhs", "hh"])
def test_wand_rank_identical_topical(topical, terms):
    idx, oracle = topical
    w = _rows(idx.bm25_topk(terms, k=15, mode="wand"))
    e = _rows(idx.bm25_topk(terms, k=15, mode="exact"))
    assert w == e
    o = oracle.similarity("bm25", terms, k=15)
    assert [(d, round(s, 9)) for d, s, _l in w] == [
        (d, round(s, 9)) for d, s, _l in o
    ]


def test_wand_rare_sparse_path(topical):
    """A genuinely rare term triggers the sparse postings machinery
    (decoded ids, postings-level bounds, singleton rescore intervals)."""
    idx, oracle = topical
    rare = (
        idx.term_dict.filter(F.col("df").between(2, 30))
        .orderBy("df", "term")
        .first()["term"]
    )
    terms = ["t1", rare]
    w = _rows(idx.bm25_topk(terms, k=10, mode="wand"))
    e = _rows(idx.bm25_topk(terms, k=10, mode="exact"))
    assert w == e
    assert len(w) == 10


def test_site_query_prunes_to_segment(topical):
    """Block-range alignment must prune a site-term query to ~its own
    doc-id segment: the surviving+candidate volume is a small fraction
    of the head term's postings."""
    idx, _ = topical
    seen = {}

    orig = idx._rescore_driver_rows

    def spy(term, salt, bseq, gen, flags, idf_map, k1, b, k):
        seen["part_blocks"] = int(term.size)
        seen["targets"] = int(flags.sum())
        return orig(term, salt, bseq, gen, flags, idf_map, k1, b, k)

    idx._rescore_driver_rows = spy
    try:
        idx.bm25_topk(["t1", "s4"], k=10, mode="wand").collect()
    finally:
        idx._rescore_driver_rows = orig
    assert seen, "pruned query should take the driver rescore"
    total_blocks = idx._blocks_for(
        [r["term_id"] for r in idx._query_info(["t1", "s4"])]
    ).count()
    # s4's segment is 1/8 of the corpus; candidates must be well under
    # half of all blocks (they'd be ~all without range alignment)
    assert seen["part_blocks"] < 0.5 * total_blocks


def test_serving_term_cache_snapshot_consistent(spark, topical):
    """The serving tier's decoded-postings LRU must be invisible:
    cached repeats equal the first (scanned) answer, and a FRESH
    instance (no cache) agrees.  After an incremental commit, the
    reopened snapshot serves the updated corpus — the old instance's
    cache dies with it."""
    idx, _ = topical
    serving = PackedIndex(spark, idx.dir, CFG)
    q = ["t1", "t2"]
    first = serving.bm25_topk_rows(q, k=10)
    cached = serving.bm25_topk_rows(q, k=10)
    assert first == cached
    assert len(first) == 10
    assert PackedIndex(spark, idx.dir, CFG).bm25_topk_rows(q, k=10) == first

    import shutil

    from tf_idf_vectorizer_spark.streaming.incremental import IncrementalIndex

    out = idx.dir + "_cacheprobe"
    shutil.rmtree(out, ignore_errors=True)
    shutil.copytree(idx.dir, out)
    s2 = PackedIndex(spark, out, CFG)
    before = s2.bm25_topk_rows(q, k=10)
    IncrementalIndex(spark, out, CFG).apply_batch(
        spark.createDataFrame(
            [(before[0][0], "t9 t9 t9 replaced")],
            "doc_id long, text string",
        )
    )
    after = PackedIndex(spark, out, CFG).bm25_topk_rows(q, k=10)
    assert after != before  # the former top doc lost its t1/t2 mass


def test_distributed_wand_sparse_paths(spark, topical):
    """The fully distributed WAND (head-term territory) uses the same
    sparse machinery: θ floors, postings-level survival credit, and
    singleton candidate intervals — rank identity must hold."""
    idx, _ = topical
    idx2 = PackedIndex(spark, idx.dir, CFG)
    idx2.META_COLLECT_MAX = 0  # force the distributed variant
    rare = (
        idx2.term_dict.filter(F.col("df").between(2, 30))
        .orderBy("df", "term")
        .first()["term"]
    )
    for terms in (["t1"], ["t1", rare], ["t1", "t2", rare], ["t1", "s4"]):
        w = _rows(idx2.bm25_topk(terms, k=10, mode="wand"))
        e = _rows(idx2.bm25_topk(terms, k=10, mode="exact"))
        assert w == e, terms


def test_wand_after_compact_keeps_tight_bounds(spark, topical, tmp_path):
    """compact() returns the index to generation 0 — exactly when
    _tight_bounds_ok trusts max_score — so the re-pack MUST recompute
    the true per-block max under current idf/avg_len (a 0.0 max_score
    would zero every bound and prune the entire index)."""
    from tf_idf_vectorizer_spark.streaming.incremental import IncrementalIndex

    idx, _ = topical
    out = str(tmp_path / "cmp")
    import shutil

    shutil.copytree(idx.dir, out)
    inc = IncrementalIndex(spark, out, CFG)
    batch = spark.createDataFrame(
        [(3, "t1 t1 s0 changed")], "doc_id long, text string"
    )
    inc.apply_batch(batch)
    inc.compact()
    idx2 = PackedIndex(spark, out, CFG)
    assert int(idx2.meta["generation"]) == 0
    assert idx2._tight_bounds_ok(CFG.k1, CFG.b)
    for terms in (["t1"], ["t1", "s4"], ["t1", "t2", "s5"]):
        w = _rows(idx2.bm25_topk(terms, k=10, mode="wand"))
        e = _rows(idx2.bm25_topk(terms, k=10, mode="exact"))
        assert w == e
        assert len(w) == 10


def test_merged_index_keeps_tight_bounds(spark, topical, tmp_path):
    """merge_indexes re-packs at generation 0 with the merged corpus
    stats; max_score must be true under the NEW idf/avg_len."""
    from tf_idf_vectorizer_spark.operators.merge import merge_indexes
    from tf_idf_vectorizer_spark.sources.synth import synth_topical_corpus

    idx, _ = topical
    out_b = str(tmp_path / "b")
    docs_b = synth_topical_corpus(
        spark, 2000, vocab=500, n_sites=8, seed=23
    ).withColumn("doc_id", F.col("doc_id") + 6000)
    build_index(spark, docs_b, out_b, config=CFG)
    out_m = str(tmp_path / "m")
    merge_indexes(spark, idx.dir, out_b, out_m, config=CFG)
    m = PackedIndex(spark, out_m, CFG)
    assert m._tight_bounds_ok(CFG.k1, CFG.b)
    for terms in (["t1"], ["t1", "s2"]):
        w = _rows(m.bm25_topk(terms, k=10, mode="wand"))
        e = _rows(m.bm25_topk(terms, k=10, mode="exact"))
        assert w == e


def test_wand_after_batch_keeps_rank_identity(spark, topical, tmp_path):
    """gen>0 disables the tight/sparse fast paths (stale rows break the
    df-derived bounds); the guarded fallback must stay rank-identical."""
    from tf_idf_vectorizer_spark.streaming.incremental import IncrementalIndex

    idx, _ = topical
    out = str(tmp_path / "inc")
    import shutil

    shutil.copytree(idx.dir, out)
    inc = IncrementalIndex(spark, out, CFG)
    batch = spark.createDataFrame(
        [(2, "t1 t1 s0 fresh"), (6001, "t1 t2 s9 new")],
        "doc_id long, text string",
    )
    inc.apply_batch(batch)
    idx2 = PackedIndex(spark, out, CFG)
    assert int(idx2.meta["generation"]) >= 1
    w = _rows(idx2.bm25_topk(["t1", "s0"], k=10, mode="wand"))
    e = _rows(idx2.bm25_topk(["t1", "s0"], k=10, mode="exact"))
    assert w == e
