"""spark-submit entry point: build the inverted index and/or run BM25
queries against it — the north rule's deployment surface.

Examples (local; on a cluster swap --master and ship the package):

  # package the library once
  (cd /root/repo && zip -qr /tmp/engine.zip tf_idf_vectorizer_spark)

  spark-submit --master local[32] --py-files /tmp/engine.zip \
      jobs/build_and_query.py build \
      --input /root/testdata/sf0.1/documents.parquet --output /data/idx

  spark-submit --master local[32] --py-files /tmp/engine.zip \
      jobs/build_and_query.py query \
      --index /data/idx --terms spark join query --k 10

  spark-submit ... jobs/build_and_query.py query \
      --index /data/idx --bool '(and "spark" (not "slow"))' --k 10

  # resume an interrupted build (per-salt manifest checkpointing)
  spark-submit ... jobs/build_and_query.py build --input ... \
      --output /data/idx --resume
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="build_and_query")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the posting-block index")
    b.add_argument("--input", required=True, help="parquet of (doc_id, text) or web-page shape")
    b.add_argument("--output", required=True, help="index directory")
    b.add_argument("--text-col", default="text")
    b.add_argument("--key-col", default="doc_id")
    b.add_argument("--url-col", default=None)
    b.add_argument("--salts", type=int, default=16)
    b.add_argument("--block-size", type=int, default=128)
    b.add_argument("--norms", action="store_true", help="precompute cosine norms")
    b.add_argument("--resume", action="store_true")

    q = sub.add_parser("query", help="BM25 top-k over a built index")
    q.add_argument("--index", required=True)
    q.add_argument("--terms", nargs="*", default=None)
    q.add_argument("--bool", dest="bool_expr", default=None,
                   help="s-expression boolean filter, e.g. '(and \"a\" \"b\")'")
    q.add_argument("--algo", default="bm25",
                   choices=["bm25", "cosine", "dot", "contains"])
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--k1", type=float, default=1.2)
    q.add_argument("--b", type=float, default=0.75)
    q.add_argument("--mode", default="auto", choices=["auto", "exact", "wand"])

    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(f"engine-{args.cmd}").getOrCreate()
    from tf_idf_vectorizer_spark.config import EngineConfig

    if args.cmd == "build":
        from tf_idf_vectorizer_spark.operators.index_build import build_index

        cfg = EngineConfig(n_salts=args.salts, block_size=args.block_size)
        docs = spark.read.parquet(args.input)
        t0 = time.time()
        meta = build_index(
            spark, docs, args.output,
            key_col=args.key_col, text_col=args.text_col, url_col=args.url_col,
            config=cfg, resume=args.resume, norms=args.norms,
        )
        meta["wall_sec"] = round(time.time() - t0, 3)
        print(json.dumps(meta))
        return 0

    from tf_idf_vectorizer_spark.query.packed import PackedIndex

    idx = PackedIndex(spark, args.index)
    if args.bool_expr:
        from tf_idf_vectorizer_spark.query.ast import parse_sexpr

        hits = idx.bm25_search(parse_sexpr(args.bool_expr), k=args.k,
                               k1=args.k1, b=args.b)
    elif args.algo == "bm25":
        hits = idx.bm25_topk(args.terms or [], k=args.k, k1=args.k1,
                             b=args.b, mode=args.mode)
    else:
        hits = idx.similarity(args.algo, args.terms or [], k=args.k)
    for r in hits.collect():
        print(json.dumps({k: r[k] for k in ("doc_id", "score", "doc_len")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
