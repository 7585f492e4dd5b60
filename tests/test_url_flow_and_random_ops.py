"""End-to-end URL-keyed flow (the input_hint corpus shape) and a seeded
randomized incremental-ops test vs the oracle (the reference's
randomized-oracle test style, index_map.rs:754-818)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from tf_idf_vectorizer_spark.config import EngineConfig
from tf_idf_vectorizer_spark.functions.tokenize import tokenize, tokenize_udf
from tf_idf_vectorizer_spark.operators.index_build import build_index
from tf_idf_vectorizer_spark.oracle import OracleIndex
from tf_idf_vectorizer_spark.query.packed import PackedIndex
from tf_idf_vectorizer_spark.sources import load_corpus, load_documents
from tf_idf_vectorizer_spark.streaming import IncrementalIndex

CFG = EngineConfig(n_salts=4, block_size=64, term_buckets=16)


def test_url_keyed_end_to_end(spark, sf_smoke, tmp_path):
    """Web-page-shaped corpus (url key) -> mint doc ids -> build ->
    query -> results joined back to urls."""
    corpus = load_corpus(spark, sf_smoke)
    # mint dense doc ids deterministically (url-sorted row_number)
    from pyspark.sql import Window

    ids = corpus.withColumn(
        "doc_id",
        F.row_number().over(Window.orderBy("url")).cast("long") - 1,
    )
    out = str(tmp_path / "urlidx")
    build_index(spark, ids, out, url_col="url", config=CFG)
    idx = PackedIndex(spark, out, CFG)
    hits = idx.bm25_topk(["spark", "join"], k=10)
    with_urls = hits.join(idx.doc_dict.select("doc_id", "url"), "doc_id")
    rows = with_urls.orderBy(F.desc("score"), F.asc("doc_id")).collect()
    assert len(rows) == 10
    assert all(r["url"].startswith("synth://") for r in rows)
    # rank matches a doc_id-keyed oracle on the same texts
    texts = {r["doc_id"]: r["text"] for r in ids.select("doc_id", "text").collect()}
    oracle = OracleIndex(texts)
    expected = oracle.similarity("bm25", ["spark", "join"], k=10)
    assert [r["doc_id"] for r in rows] == [e[0] for e in expected]
    for r, e in zip(rows, expected):
        assert math.isclose(r["score"], e[1], rel_tol=1e-6)


def test_tokenize_udf_matches_builtin(spark, sf_smoke):
    docs = load_documents(spark, sf_smoke).limit(100)
    a = tokenize(docs.select("doc_id", "text")).select("doc_id", "tokens")
    tok = tokenize_udf()
    b = docs.select("doc_id", tok(F.col("text")).alias("tokens"))
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    assert diff == 0


VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _rand_text(rng: random.Random) -> str:
    return " ".join(rng.choices(VOCAB, k=rng.randint(3, 12)))


def test_randomized_incremental_ops_vs_oracle(spark, tmp_path):
    """Seeded random add/overwrite/delete stream applied through
    IncrementalIndex == oracle built from the surviving state.
    Seed style follows the reference (0xC0FFEE, index_map.rs:757)."""
    rng = random.Random(0xC0FFEE)
    state: dict[int, str] = {i: _rand_text(rng) for i in range(40)}
    base = spark.createDataFrame(list(state.items()), "doc_id long, text string")
    out = str(tmp_path / "rnd")
    build_index(spark, base, out, config=CFG)
    inc = IncrementalIndex(spark, out, CFG)

    next_id = 40
    for _batch in range(4):
        adds, deletes = {}, []
        for _ in range(rng.randint(1, 6)):
            op = rng.choice(["add", "overwrite", "delete"])
            if op == "add":
                adds[next_id] = _rand_text(rng)
                next_id += 1
            elif op == "overwrite" and state:
                k = rng.choice(sorted(state))
                adds[k] = _rand_text(rng)
            elif op == "delete" and state:
                k = rng.choice(sorted(state))
                deletes.append(k)
                state.pop(k)
        # apply to the mirror AFTER choosing deletes (delete-then-add
        # within one batch: an id in both is an overwrite)
        for k, v in adds.items():
            state[k] = v
        inc.apply_batch(
            adds=spark.createDataFrame(list(adds.items()), "doc_id long, text string")
            if adds
            else None,
            delete_ids=deletes,
        )

    oracle = OracleIndex(state)
    idx = PackedIndex(spark, out, CFG)
    for terms in (["alpha"], ["beta", "gamma"], ["theta", "eps", "zeta"]):
        got = idx.bm25_topk(terms, k=25, mode="exact").collect()
        want = oracle.similarity("bm25", terms, k=25)
        assert [r["doc_id"] for r in got] == [w[0] for w in want], terms
        for g, w in zip(got, want):
            assert math.isclose(g["score"], w[1], rel_tol=1e-9), (terms, g, w)


def test_randomized_set_term_counts_vs_oracle(spark, tmp_path):
    """Seeded random term-level patches (set exact count / delete term /
    add new vocab) interleaved with doc ops == oracle of the mirrored
    final state (same oracle style, seed 0xC0FFEE ^ 1)."""
    from collections import Counter

    rng = random.Random(0xC0FFEE ^ 1)
    state: dict[int, str] = {i: _rand_text(rng) for i in range(30)}
    base = spark.createDataFrame(list(state.items()), "doc_id long, text string")
    out = str(tmp_path / "rnd_stc")
    build_index(spark, base, out, config=CFG)
    inc = IncrementalIndex(spark, out, CFG)

    for _batch in range(3):
        updates = []
        for _ in range(rng.randint(1, 5)):
            k = rng.choice(sorted(state))
            cnt = Counter(state[k].split())
            pool = sorted(cnt) + [f"newt{rng.randint(0, 3)}"]
            term = rng.choice(pool)
            val = rng.randint(0, 3)
            updates.append((k, term, val))
            if val == 0:
                cnt.pop(term, None)
            else:
                cnt[term] = val
            state[k] = " ".join(
                t for t, c in sorted(cnt.items()) for _ in range(c)
            )
        inc.set_term_counts(
            spark.createDataFrame(updates, "doc_id long, term string, count long")
        )
        # interleave a plain doc op to exercise gen mixing
        k = rng.choice(sorted(state))
        state[k] = _rand_text(rng)
        inc.apply_batch(
            adds=spark.createDataFrame([(k, state[k])], "doc_id long, text string")
        )

    oracle = OracleIndex(state)
    idx = PackedIndex(spark, out, CFG)
    for terms in (["alpha", "newt0"], ["beta", "newt1", "gamma"], ["theta"]):
        got = idx.bm25_topk(terms, k=25, mode="exact").collect()
        want = oracle.similarity("bm25", terms, k=25)
        assert [r["doc_id"] for r in got] == [w[0] for w in want], terms
        for g, w in zip(got, want):
            assert math.isclose(g["score"], w[1], rel_tol=1e-9), (terms, g, w)
