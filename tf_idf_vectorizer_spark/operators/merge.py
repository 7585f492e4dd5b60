"""Two-index merge: combine independently built index directories.

The reference merges vectorizers by unioning the term dictionaries,
building a term-id permutation, remapping + re-sorting every document
vector, and re-adding the other side's docs (overwrite on key collision)
— /root/reference/src/vectorizer/mod.rs:311-338 (``perm`` at
src/utils/datastruct/vector/tf.rs:109-118), exercised by
examples/merge.rs:19-28 after a sharded parallel build.

The Spark restatement is simpler because term ids are CONTENT hashes
(xxhash64(term)), identical across any two builds: no permutation, no
remap.  Merging is a dataflow over live posting rows:

  decode(live rows of A, minus B's doc ids)  ∪  decode(live rows of B)
    -> re-salt -> pack_blocks_jvm(gen 0) -> write out_dir

Collision policy matches the reference: a doc id present in both sides
takes B's content (``merge`` calls ``add_tf_vec`` which overwrites,
mod.rs:191-204).  DF/IDF stats are re-derived from the merged live rows
— equivalent to Corpus::merge_corpus plus the overwrite corrections the
reference applies doc-by-doc (corpus/mod.rs:145-158).

The merged index is query-identical to a fresh build of the union corpus
(tested), which is exactly the reference's sharded-build contract.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tf_idf_vectorizer_spark.config import DEFAULT, EngineConfig
from tf_idf_vectorizer_spark.operators.index_build import (
    pack_blocks_jvm,
    write_term_dict,
)
from tf_idf_vectorizer_spark.query.packed import PackedIndex


def merge_indexes(
    spark: SparkSession,
    dir_a: str,
    dir_b: str,
    out_dir: str,
    config: EngineConfig = DEFAULT,
) -> dict:
    """Merge index ``dir_a`` with ``dir_b`` into ``out_dir`` (B wins on
    doc-id collisions).  Returns the merged meta dict."""
    t0 = time.time()
    a = PackedIndex(spark, dir_a, config)
    b = PackedIndex(spark, dir_b, config)
    if a.meta.get("precision") != b.meta.get("precision"):
        raise ValueError("cannot merge indexes built at different precisions")
    # the tokenizer travels with the index (build_index records it so
    # incremental batches tokenize like the build); merging two indexes
    # tokenized differently would mix incompatible vocabularies (CJK
    # bigrams vs whitespace runs) with no error at query time
    tok_a = a.meta.get("tokenizer", "ws")
    tok_b = b.meta.get("tokenizer", "ws")
    if tok_a != tok_b:
        raise ValueError(
            f"cannot merge indexes built with different tokenizers "
            f"({tok_a!r} vs {tok_b!r})"
        )
    precision = a.meta.get("precision", "f32")
    norms = bool(a.meta.get("norms", False)) and bool(b.meta.get("norms", False))
    os.makedirs(out_dir, exist_ok=True)

    b_ids = b.doc_dict.select("doc_id")

    def _live(idx: PackedIndex):
        decoded = idx.decode_postings(None)
        return decoded.join(
            idx.doc_dict.select("doc_id", "gen", "doc_len"), ["doc_id", "gen"]
        ).select("term_id", "doc_id", "tf", "doc_len")

    rows = _live(a).join(b_ids, "doc_id", "left_anti").unionByName(_live(b))

    # merged doc universe (incl. zero-token docs from both sides)
    dd_a = a.doc_dict.join(b_ids, "doc_id", "left_anti")
    common = sorted(set(dd_a.columns) & set(b.doc_dict.columns))
    doc_dict = (
        dd_a.select(*common)
        .unionByName(b.doc_dict.select(*common))
        .withColumn("gen", F.lit(0))
    )
    doc_num, total_len, max_id = doc_dict.agg(
        F.count("*"), F.sum("doc_len"), F.max("doc_id")
    ).first()
    doc_num, total_len = int(doc_num), int(total_len or 0)
    max_id = int(max_id) if max_id is not None else 0

    # stats re-derived from merged live rows: df = #docs per term (each
    # (term, doc) appears once); idf = N/(df+1) (tfidf.rs:32-40)
    terms = (
        a.term_dict.select("term_id", "term")
        .unionByName(b.term_dict.select("term_id", "term"))
        .distinct()
    )
    df_stats = rows.groupBy("term_id").agg(F.count("*").alias("df"))
    dt = "float" if precision == "f32" else "double"
    term_dict = df_stats.join(terms, "term_id").select(
        "term_id",
        "term",
        "df",
        (F.lit(float(doc_num)) / (F.col("df") + F.lit(1.0))).cast(dt).alias("idf"),
    )
    term_dict.cache()
    n_terms, term_bytes = term_dict.agg(
        F.count("*"), F.sum(F.length("term"))
    ).first()

    if norms:
        w = F.col("tf").cast(dt) * F.col("idf").cast(dt)
        new_norms = (
            rows.join(term_dict.select("term_id", "idf"), "term_id")
            .groupBy("doc_id")
            .agg(F.sqrt(F.sum((w * w).cast("double"))).alias("new_norm"))
        )
        doc_dict = (
            doc_dict.join(new_norms, "doc_id", "left")
            .fillna({"new_norm": 0.0})
            .drop("norm")
            .withColumnRenamed("new_norm", "norm")
        )

    n_salts = max(
        int(config.n_salts), -(-(max_id + 1) // int(config.salt_target_rows))
    )
    salt_range = max(1, (max_id + n_salts) // n_salts)
    # (term_id, salt) clustering comes from the pack aggregation itself
    salted = rows.select(
        "term_id",
        (F.col("doc_id") / F.lit(salt_range)).cast("int").alias("salt"),
        "doc_id",
        F.col("tf").cast("int").alias("tf"),
        F.col("doc_len").cast("int").alias("doc_len"),
    )
    # no explicit repartition: the pack aggregation's own exchange puts
    # partial_collect_list below the shuffle (measured 1.7x faster than
    # a fine-grained explicit repartition on the compact path — see
    # incremental.compact)
    build_avg_len = float(total_len) / max(doc_num, 1)
    # idf_df: per-block max_score is the TRUE max impact under the
    # MERGED corpus stats (tight WAND bounds survive the merge; without
    # it max_score would be 0 and must not be trusted — see
    # meta["tight_bounds"])
    packed = pack_blocks_jvm(
        salted, config.block_size, config.term_buckets, gen=0,
        avg_len=build_avg_len, k1=config.k1, b=config.b,
        idf_df=term_dict.select("term_id", "idf"),
        max_doc_bound=max_id,
    )
    # blocks (small, compressed) reshuffle to the salt layout
    packed = packed.repartition(4 * n_salts, "salt")
    # sort leads with salt so FileFormatWriter keeps this ordering
    # instead of inserting its own order-shredding SortExec(salt)
    # (see index_build.py pack_write)
    packed.sortWithinPartitions(
        "salt", "term_id", "block_seq"
    ).write.partitionBy("salt").option(
        "parquet.block.size", str(int(config.pq_rowgroup_bytes))
    ).mode("overwrite").parquet(f"{out_dir}/postings")
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    doc_dict.coalesce(max(1, shuffle_parts // 4)).write.mode("overwrite").parquet(
        f"{out_dir}/doc_dict"
    )
    write_term_dict(
        term_dict, f"{out_dir}/term_dict",
        max(1, shuffle_parts // 8), config.pq_rowgroup_bytes,
    )

    # per-salt lineage, metadata columns only (same shape as build_index)
    written = spark.read.parquet(f"{out_dir}/postings")
    lineage = written.groupBy("salt").agg(
        F.sum("n").alias("rows_in"),
        F.expr(
            "bit_xor(xxhash64(term_id, block_seq, n, min_doc, max_doc))"
        ).alias("checksum"),
    )
    (
        lineage.withColumn("phase", F.lit("merge"))
        .withColumn("rows_out", F.col("rows_in"))
        .withColumn("ts", F.current_timestamp())
        .select("salt", "phase", "rows_in", "rows_out", "checksum", "ts")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/manifest")
    )
    term_dict.unpersist()

    meta = {
        "doc_num": doc_num,
        "total_len": total_len,
        "n_terms": int(n_terms),
        "term_bytes": int(term_bytes or 0),
        "salt_range": int(salt_range),
        "n_salts": int(n_salts),
        "term_buckets": int(config.term_buckets),
        "block_size": int(config.block_size),
        "precision": precision,
        "norms": norms,
        "generation": 0,
        "k1": float(config.k1),
        "b": float(config.b),
        "tight_bounds": True,
        "dtype": config.dtype,
        "tokenizer": tok_a,
        "built_in_sec": round(time.time() - t0, 3),
        "merged_from": [dir_a, dir_b],
    }
    from tf_idf_vectorizer_spark.ioutil import write_json_atomic

    write_json_atomic(meta, f"{out_dir}/meta.json")
    return meta
