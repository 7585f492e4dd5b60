"""Unit tests for the training-data pipeline operators: dedup semantics
on a corpus with planted duplicates, ANN bucket behavior, multimodal
plumbing shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tf_idf_vectorizer_spark.pipeline import dedup, multimodal, textqc
from tf_idf_vectorizer_spark.pipeline.similarity import (
    brute_force_topk,
    lsh_bucket_topk,
    sign_bucket_expr,
)


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [
        (0, "alpha beta gamma delta"),
        (1, "alpha beta gamma delta"),          # exact dup of 0
        (2, "alpha beta gamma delta epsilon"),  # near dup of 0
        (3, "totally different words here"),
        (4, "alpha beta gamma delta"),          # exact dup of 0
        (5, "unrelated content entirely now"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(dup_docs):
    out = dedup.exact_duplicates(dup_docs).collect()
    assert len(out) == 1
    assert out[0]["n_docs"] == 3
    assert out[0]["keep_doc_id"] == 0


def test_dedup_keep_first(dup_docs):
    kept = sorted(r["doc_id"] for r in dedup.dedup_keep_first(dup_docs).collect())
    assert kept == [0, 2, 3, 5]


def test_lsh_finds_exact_and_near_dups(dup_docs):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidate_pairs(dup_docs, n_bands=4, rows_per_band=2).collect()
    }
    # exact dups always collide in every band
    assert (0, 1) in pairs and (0, 4) in pairs and (1, 4) in pairs
    # unrelated docs should not pair with the alpha cluster in all bands
    assert (3, 5) not in pairs


def test_jaccard_values(dup_docs):
    out = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(dup_docs, threshold=0.0).collect()
    }
    assert out[(0, 1)] == 1.0
    assert abs(out[(0, 2)] - 4.0 / 5.0) < 1e-12


def test_simhash_dups_equal(dup_docs):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash16(dup_docs).collect()}
    assert sh[0] == sh[1] == sh[4]
    assert 0 <= sh[0] < (1 << 16)


def test_embedding_near_dup_and_ann(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    topk = brute_force_topk(emb, [0, 1], k=5).collect()
    by_q = {}
    for r in topk:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1}
    for q, rows in by_q.items():
        assert len(rows) == 5
        scores = [r["cosine"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert all(r["vec_id"] != q for r in rows)


def test_lsh_bucket_subset_of_bruteforce_candidates(spark, sf_smoke):
    """Bucketed search only returns vectors from the query's bucket."""
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    out = lsh_bucket_topk(emb, [0], k=50, n_bits=4).collect()
    bucketed = emb.withColumn("b", sign_bucket_expr("embedding", 4))
    qb = bucketed.filter(F.col("vec_id") == 0).first()["b"]
    allowed = {
        r["vec_id"] for r in bucketed.filter(F.col("b") == qb).collect()
    }
    assert all(r["vec_id"] in allowed for r in out)


def test_multimodal_feature_shape(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(50)
    media = multimodal.attach_fake_media(docs)
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 50
    assert all(len(r["features"]) == multimodal.FEATURE_DIM for r in feats)
    # deterministic: same input -> same features
    again = multimodal.extract_features(media).collect()
    assert sorted(map(str, feats)) == sorted(map(str, again))


def test_multimodal_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"xxx")


def test_frame_sample_plan(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(30)
    media = multimodal.attach_fake_media(docs)
    frames = multimodal.frame_sample_plan(media, every_ms=5000)
    joined = frames.join(media.select("doc_id", "media_type", "duration_ms"), "doc_id")
    rows = joined.collect()
    assert all(r["media_type"] == "video" for r in rows)
    assert all(0 <= r["frame_ts_ms"] < r["duration_ms"] for r in rows)


def test_quality_score_range(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    out = textqc.quality_scores(docs).agg(
        F.min("quality"), F.max("quality")
    ).first()
    assert 0.0 <= out[0] and out[1] <= 1.0


def test_shingle_minhash_matches_python(spark):
    """Spark shingle MinHash == a direct python computation (word
    3-grams, salted-md5 min)."""
    import hashlib

    from tf_idf_vectorizer_spark.pipeline.dedup import minhash_signatures

    texts = {
        0: "a b c d e",
        1: "a b",            # shorter than the shingle -> no features
        2: "x y z x y z",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["sig_0"], r["sig_1"])
        for r in minhash_signatures(docs, n_hashes=2, shingle=3).collect()
    }

    def mh(text, i):
        toks = text.split()
        sh = {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}
        return min(
            hashlib.md5(f"{s}#{i}".encode()).hexdigest() for s in sh
        ) if sh else None

    for d, t in texts.items():
        if mh(t, 0) is None:
            assert d not in got  # no shingles -> no signature row
        else:
            assert got[d] == (mh(t, 0), mh(t, 1)), d


def test_lsh_pairs_with_shingles(spark, sf_smoke):
    from pyspark.sql import functions as F

    from tf_idf_vectorizer_spark.pipeline.dedup import lsh_candidate_pairs
    from tf_idf_vectorizer_spark.sources import load_documents

    docs = load_documents(spark, sf_smoke).filter(F.col("doc_id") < 60)
    pairs = lsh_candidate_pairs(docs, n_bands=2, rows_per_band=2, shingle=2)
    rows = pairs.collect()
    assert all(r["doc_a"] < r["doc_b"] for r in rows)
