"""compact()'s budget-gated numpy fast path must be BIT-IDENTICAL to
the JVM pack tiers: same postings files (every column, including the
varint payload bytes and the double max_score), so its correctness is
inherited from the long-standing pack_blocks_jvm path rather than
argued.  The three tiers under test:

  fast        — pinned doc stats + pinned dictionary: one mapInPandas
                over compressed blocks (make_live_repacker)
  broadcast   — pinned doc stats only: broadcast-liveness decode +
                pack_blocks_jvm (forced via DRIVER_DICT_MAX_TERMS=0)
  distributed — neither pinned: liveness join + pack_blocks_jvm
                (forced via DRIVER_DOC_STATS_MAX=0 as well)
"""

from __future__ import annotations

import json
import math
import shutil

import pytest
from pyspark.sql import functions as F

from tf_idf_vectorizer_spark.config import EngineConfig
from tf_idf_vectorizer_spark.ioutil import table_path
from tf_idf_vectorizer_spark.operators.index_build import build_index
from tf_idf_vectorizer_spark.query.packed import PackedIndex
from tf_idf_vectorizer_spark.sources.synth import synth_corpus
from tf_idf_vectorizer_spark.streaming import IncrementalIndex

CFG = EngineConfig(n_salts=4, block_size=32, term_buckets=8)


def _mixed_history_index(spark, out_dir: str) -> None:
    """Seeded index with a messy MVCC history: appends (new vocab and
    new salts), overwrites (dead gen-0 rows + live gen>0 rows in OLD
    salts), deletes, and a term spread across generations."""
    docs = synth_corpus(spark, 3000, vocab=2500, seed=7).select(
        "doc_id", "text"
    )
    build_index(spark, docs, out_dir, config=CFG)
    inc = IncrementalIndex(spark, out_dir, CFG)
    adds1 = synth_corpus(spark, 400, vocab=2500, seed=11).select(
        (F.col("doc_id") + F.lit(3000)).alias("doc_id"), "text"
    )
    inc.apply_batch(adds=adds1)  # pure append -> new salts, gen 1
    over = spark.createDataFrame(
        [
            (0, "overwritten alpha alpha spark"),
            (17, "the query rewrites this doc entirely"),
            (2999, "tail doc overwritten with fresh vocabzz"),
        ],
        "doc_id long, text string",
    )
    inc.apply_batch(adds=over, delete_ids=[5, 6, 777, 3001])


def _postings_rows(spark, idx_dir: str):
    meta = json.load(open(f"{idx_dir}/meta.json"))
    df = spark.read.parquet(table_path(idx_dir, meta, "postings"))
    rows = (
        df.orderBy("term_id", "salt", "block_seq")
        .collect()
    )
    return meta, rows


def test_compact_fast_path_bit_identical_to_jvm_tiers(
    spark, tmp_path, monkeypatch
):
    base = str(tmp_path / "base")
    _mixed_history_index(spark, base)

    dirs = {t: str(tmp_path / t) for t in ("fast", "broadcast", "dist")}
    for d in dirs.values():
        shutil.copytree(base, d)

    # pre-compact reference results for the query-identity check
    idx0 = PackedIndex(spark, dirs["fast"], CFG)
    before = [
        (r["doc_id"], r["score"])
        for r in idx0.bm25_topk(["alpha", "spark", "the"], k=20).collect()
    ]

    IncrementalIndex(spark, dirs["fast"], CFG).compact()

    monkeypatch.setattr(PackedIndex, "DRIVER_DICT_MAX_TERMS", 0)
    IncrementalIndex(spark, dirs["broadcast"], CFG).compact()

    monkeypatch.setattr(PackedIndex, "DRIVER_DOC_STATS_MAX", 0)
    IncrementalIndex(spark, dirs["dist"], CFG).compact()
    monkeypatch.undo()

    meta_f, rows_f = _postings_rows(spark, dirs["fast"])
    meta_b, rows_b = _postings_rows(spark, dirs["broadcast"])
    meta_d, rows_d = _postings_rows(spark, dirs["dist"])

    assert len(rows_f) > 0
    assert len(rows_f) == len(rows_b) == len(rows_d)
    cols = [
        "term_id", "salt", "block_seq", "n", "min_doc", "max_doc",
        "max_tf", "min_dl", "max_dl", "max_score", "doc_deltas", "tfs",
        "bucket", "gen",
    ]
    for rf, rb, rd in zip(rows_f, rows_b, rows_d):
        for c in cols:
            vf, vb, vd = rf[c], rb[c], rd[c]
            if c == "max_score":
                # bit-level check: the WAND planner uses max_score both
                # as an upper bound and (k-th largest) as a theta floor,
                # so even a one-ULP drift would change pruning
                assert math.isclose(vf, vb, rel_tol=0.0, abs_tol=0.0), (
                    rf["term_id"], rf["salt"], rf["block_seq"], vf, vb
                )
                assert math.isclose(vf, vd, rel_tol=0.0, abs_tol=0.0)
            else:
                assert vf == vb, (c, rf, rb)
                assert vf == vd, (c, rf, rd)

    # meta agrees where it matters
    for m in (meta_b, meta_d):
        assert meta_f["generation"] == m["generation"] == 0
        assert meta_f["doc_num"] == m["doc_num"]
        assert meta_f["total_len"] == m["total_len"]
        assert meta_f.get("tight_bounds") is True

    # strongest form: the WRITTEN postings files are byte-identical
    # (same partition dirs, sizes and md5 — footer metadata included;
    # the fast path declares the JVM pack's exact nullability so even
    # the parquet definition levels match)
    import glob
    import hashlib
    import os

    def _file_digests(idx_dir, meta):
        root = f"{idx_dir}/{meta['tables']['postings']}"
        out = {}
        for f in glob.glob(f"{root}/**/*.parquet", recursive=True):
            rel = os.path.relpath(f, root)
            key = (os.path.dirname(rel), os.path.basename(rel).split("-")[1])
            with open(f, "rb") as fh:
                out[key] = (
                    os.path.getsize(f),
                    hashlib.md5(fh.read()).hexdigest(),
                )
        return out

    dig_f = _file_digests(dirs["fast"], meta_f)
    dig_b = _file_digests(dirs["broadcast"], meta_b)
    assert dig_f and dig_f == dig_b

    # and queries over the fast-path compacted index are unchanged
    idx1 = PackedIndex(spark, dirs["fast"], CFG)
    after = [
        (r["doc_id"], r["score"])
        for r in idx1.bm25_topk(["alpha", "spark", "the"], k=20).collect()
    ]
    assert [d for d, _ in before] == [d for d, _ in after]
    for (_, s0), (_, s1) in zip(before, after):
        assert math.isclose(s0, s1, rel_tol=1e-12, abs_tol=1e-12)


def test_compact_fast_path_pure_gen0_roundtrip(spark, tmp_path):
    """Compacting a freshly built (all-gen-0, nothing dead) index via
    the fast path must reproduce the postings exactly (modulo the
    max_score recompute, which equals the build's for an unchanged
    corpus)."""
    out = str(tmp_path / "clean")
    docs = synth_corpus(spark, 1200, vocab=900, seed=3).select(
        "doc_id", "text"
    )
    build_index(spark, docs, out, config=CFG)
    _, rows_before = _postings_rows(spark, out)
    IncrementalIndex(spark, out, CFG).compact()
    _, rows_after = _postings_rows(spark, out)
    assert len(rows_before) == len(rows_after) > 0
    for r0, r1 in zip(rows_before, rows_after):
        for c in ("term_id", "salt", "block_seq", "n", "min_doc",
                  "max_doc", "max_tf", "min_dl", "max_dl", "doc_deltas",
                  "tfs", "bucket", "max_score"):
            assert r0[c] == r1[c], (c, r0, r1)
