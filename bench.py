"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Covers the north-rule metrics:
  * index-build throughput (docs/sec) — on the driver's sf documents AND
    on a larger deterministic Zipf corpus (synth_corpus) that actually
    exercises salting/compression (the sf vocab is 31 terms);
  * BM25 top-k latency (p50/p95 over a query mix) on the WAND path;
  * scaling efficiency between two parallelism levels (local[N/4] vs
    local[N]) on the SAME input — the sandbox stand-in for N vs 4N
    executors (BASELINE.md records the numbers).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_SYNTH_DOCS (default 100000), BENCH_SCALING=0 to skip scaling.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tf_idf_vectorizer_spark.config import EngineConfig  # noqa: E402
from tf_idf_vectorizer_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SYNTH_DOCS = int(os.environ.get("BENCH_SYNTH_DOCS", "100000"))
RUN_SCALING = os.environ.get("BENCH_SCALING", "1") != "0"

QUERY_MIX = [
    ("rare", ["t40000", "t45000"]),
    ("head", ["t1"]),
    ("head_rare", ["t1", "t2", "t30000"]),
    ("or8", ["t2", "t3", "t5", "t8", "t13", "t100", "t1000", "t20000"]),
]


def _build_synth(spark, n_docs, out_dir, cfg):
    from tf_idf_vectorizer_spark.operators.index_build import build_index
    from tf_idf_vectorizer_spark.sources.synth import synth_corpus

    docs = synth_corpus(spark, n_docs, vocab=50_000, seed=42).select(
        "doc_id", "text"
    )
    t0 = time.time()
    build_index(spark, docs, out_dir, config=cfg)
    return time.time() - t0


def main() -> None:
    results: dict[str, float] = {}
    cfg = EngineConfig(n_salts=16, block_size=128, term_buckets=64)
    tmp = tempfile.mkdtemp(prefix="bench_idx_")

    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)

    # ---- 1. index build on driver sf documents ------------------------
    from tf_idf_vectorizer_spark.operators.index_build import build_index
    from tf_idf_vectorizer_spark.query.packed import PackedIndex
    from tf_idf_vectorizer_spark.query.exact import ExactSearcher
    from tf_idf_vectorizer_spark.sources import load_documents

    docs = load_documents(spark, SF_DIR)
    n_sf_docs = docs.count()
    t0 = time.time()
    build_index(spark, docs, f"{tmp}/sf_idx", config=cfg)
    results["sf_index_build"] = time.time() - t0
    results["sf_build_docs_per_sec"] = round(n_sf_docs / results["sf_index_build"], 1)

    # ---- 2. big synthetic build (the real throughput number) ----------
    results["synth_index_build"] = _build_synth(spark, SYNTH_DOCS, f"{tmp}/syn_idx", cfg)
    results["synth_build_docs_per_sec"] = round(
        SYNTH_DOCS / results["synth_index_build"], 1
    )

    # ---- 3. WAND query latency mix -------------------------------------
    idx = PackedIndex(spark, f"{tmp}/syn_idx", cfg)
    lat_warm: list[float] = []
    for name, terms in QUERY_MIX:
        for rep in range(4):
            t0 = time.time()
            idx.bm25_topk(terms, k=10, mode="auto").collect()
            dt = time.time() - t0
            if rep == 0:
                results[f"q_{name}_cold"] = round(dt, 3)
            else:
                lat_warm.append(dt)
                if rep == 1:
                    results[f"q_{name}"] = round(dt, 3)
    results["query_p50"] = round(statistics.median(lat_warm), 3)
    results["query_p95"] = round(
        sorted(lat_warm)[max(0, int(len(lat_warm) * 0.95) - 1)], 3
    )
    # forced-WAND latency (the 10^12-scale path), for the record
    t0 = time.time()
    idx.bm25_topk(QUERY_MIX[2][1], k=10, mode="wand").collect()
    results["q_wand_forced"] = round(time.time() - t0, 3)

    # ---- 4. exact-path scorer latency on sf docs -----------------------
    searcher = ExactSearcher(spark, docs)
    for algo in ["bm25", "cosine", "dot"]:
        t0 = time.time()
        searcher.similarity(algo, ["spark", "join", "query"], k=10).collect()
        results[f"exact_{algo}"] = round(time.time() - t0, 3)

    spark.stop()

    # ---- 5. scaling: same job at N/4 and N cores ------------------------
    scaling = {}
    if RUN_SCALING:
        lo = max(1, CPUS // 4)
        times = {}
        for n in (lo, CPUS):
            s = get_spark(f"bench{n}", master=f"local[{n}]", shuffle_partitions=n)
            times[n] = _build_synth(s, SYNTH_DOCS, f"{tmp}/scale_{n}", cfg)
            s.stop()
        thr_lo = SYNTH_DOCS / times[lo]
        thr_hi = SYNTH_DOCS / times[CPUS]
        scaling = {
            f"local{lo}_docs_per_sec": round(thr_lo, 1),
            f"local{CPUS}_docs_per_sec": round(thr_hi, 1),
            "efficiency": round((thr_hi / thr_lo) / (CPUS / lo), 3),
        }
        results.update({f"scaling_{k}": v for k, v in scaling.items()})

    total = sum(
        v for k, v in results.items()
        if k in ("sf_index_build", "synth_index_build", "query_p95")
    )
    print(
        json.dumps(
            {
                "metric": "index_build_sec + wand_query_p95_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in results.items()},
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
            }
        )
    )


if __name__ == "__main__":
    main()
