"""Incremental index maintenance: the reference's add_doc / del_doc /
merge semantics re-expressed as micro-batch deltas.

Reference behavior (/root/reference/src/vectorizer/mod.rs):
  add_doc   118-181: register vocab, build TF vector, append postings,
            corpus add/sub deltas
  del_doc   227-259: remove doc, strip postings, corpus sub_set
  merge     311-338: union dictionaries, remap ids, re-add docs

Spark idiom (SURVEY.md §1.3): per-doc O(1) mutation is replaced by
APPEND-oriented micro-batches with MVCC generations (the Iceberg
sequence-number idiom):

  * every posting block and every doc_dict row carries ``gen``; a doc's
    live posting rows are those whose gen MATCHES its doc_dict row —
    the scoring join on (doc_id, gen) drops stale rows for free;
  * adds/overwrites write new blocks at the batch's generation and
    upsert doc_dict (overwrite = same id, higher gen — old rows become
    unreachable, no in-place rewrite: the reference's sorted-merge
    posting patch at mod.rs:183-225 disappears);
  * deletes remove the doc_dict row; per-term DF corrections
    (Corpus::sub_set, corpus/mod.rs:70-85) are computed by decoding only
    blocks whose doc-range intersects the delete set;
  * term_dict df/idf is rewritten from the deltas, and doc_num/total_len
    are updated in meta — the reference's lazy IDF-cache invalidation
    (mod.rs:95-107) becomes an eager tiny-table rewrite;
  * cosine norms are IDF-weighted over ALL doc terms (scoring.rs:377-395),
    so ANY batch staleness them corpus-wide — apply_batch flips
    ``meta["norms"]`` off (packed cosine then refuses instead of lying)
    and ``refresh_norms()`` is the recompute job (SURVEY.md §7.3);
  * ``compact()`` reclaims stale bytes: decode live rows, re-pack at
    gen 0 — the periodic two-phase merge (Iceberg table maintenance).

Table rewrites go through a temp dir + rename-aside swap (crash between
the two renames is recoverable at open time — ``recover_dir``), never
through a driver collect — the same flow works when doc_dict has 10^12
rows.  Driver-held state per batch is bounded by the BATCH size (the
upsert/delete id lists), never by the corpus.

Invariant (tested): applying any delta stream then querying ==
building fresh from the final corpus state.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tf_idf_vectorizer_spark.config import DEFAULT, EngineConfig, with_effective_tf
from tf_idf_vectorizer_spark.functions.tokenize import term_frequencies
from tf_idf_vectorizer_spark.ioutil import recover_dir
from tf_idf_vectorizer_spark.operators.index_build import pack_blocks_jvm
from tf_idf_vectorizer_spark.query.packed import (
    PackedIndex,
    _decode_blocks_iter,
    blocks_overlapping_ids,
)

_DECODED = "term_id long, doc_id long, tf long, gen int"


def _swap_write(df: DataFrame, path: str, parts: int) -> None:
    """Replace a table via write-to-temp + rename-aside + rename-in:
    at no point is the live path absent together with its predecessor,
    so a crash at any step is recoverable by ``recover_dir`` (readers
    of the old files finish their scans; no driver materialization)."""
    tmp, old = path + "_new", path + "_old"
    df.coalesce(parts).write.mode("overwrite").parquet(tmp)
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    # drop any cached plans pinned to this path — without this a new
    # spark.read.parquet(path) can silently serve the PRE-swap bytes
    # from the cache manager (plans match by path)
    df.sparkSession.catalog.refreshByPath(path)


class IncrementalIndex:
    """Mutable wrapper around a packed index directory."""

    def __init__(self, spark: SparkSession, index_dir: str, config: EngineConfig = DEFAULT):
        self.spark = spark
        self.dir = index_dir
        self.config = config
        for table in ("term_dict", "doc_dict", "postings"):
            if recover_dir(f"{index_dir}/{table}"):
                spark.catalog.refreshByPath(f"{index_dir}/{table}")

    def _meta(self) -> dict:
        with open(f"{self.dir}/meta.json") as fh:
            return json.load(fh)

    def _write_meta(self, meta: dict) -> None:
        with open(f"{self.dir}/meta.json", "w") as fh:
            json.dump(meta, fh, indent=2)

    # ------------------------------------------------------------------
    def apply_batch(
        self,
        adds: DataFrame | None = None,
        delete_ids: list[int] | None = None,
        key_col: str = "doc_id",
        text_col: str = "text",
        refresh_norms: bool = False,
        tf_adds: DataFrame | None = None,
        tf_add_ids: DataFrame | None = None,
    ) -> dict:
        """Apply one micro-batch.  An added id that already exists is an
        overwrite (old generation's rows become unreachable).

        Documents enter either as text (``adds``: (doc_id, text)) or as
        pre-aggregated RAW term counts (``tf_adds``: (doc_id, term, tf),
        one row per (doc, term) — the reference's add_doc ingests a
        TermFrequency map directly, mod.rs:118).  ``tf_add_ids``
        optionally names the full upserted doc set when some docs have
        zero rows (they become live empty docs).

        On an index built with norms=True the batch invalidates the
        precomputed cosine norms (IDF moved for every term, so every
        doc's norm is stale — scoring.rs:377-395 semantics):
        ``meta["norms"]`` flips False unless ``refresh_norms=True``,
        which runs :meth:`refresh_norms` after the batch.
        """
        if adds is not None and tf_adds is not None:
            raise ValueError("pass adds (text) OR tf_adds (counts), not both")
        spark = self.spark
        meta = self._meta()
        gen = int(meta.get("generation", 0)) + 1
        delete_ids = sorted(set(delete_ids or []))
        doc_dict = spark.read.parquet(f"{self.dir}/doc_dict")
        dd_extra = [c for c in doc_dict.columns
                    if c not in ("doc_id", "doc_len", "norm", "gen")]
        term_dict = spark.read.parquet(f"{self.dir}/term_dict")

        ids_df = None
        if adds is not None:
            adds = adds.select(
                F.col(key_col).alias("doc_id"), F.col(text_col).alias("text")
            ).cache()
            ids_df = adds.select("doc_id")
        elif tf_adds is not None:
            tf_adds = tf_adds.select(
                F.col(key_col).alias("doc_id"), "term", "tf"
            ).cache()
            ids_df = (
                tf_add_ids.select(F.col(key_col).alias("doc_id"))
                if tf_add_ids is not None
                else tf_adds.select("doc_id")
            ).distinct().cache()

        dead_ids = set(delete_ids)
        if ids_df is not None:
            dead_ids |= {
                r[0]
                for r in doc_dict.join(ids_df, "doc_id", "left_semi")
                .select("doc_id")
                .collect()
            }
        dead_ids = sorted(dead_ids)

        # ---- DF corrections for dying rows (Corpus::sub_set) ------------
        df_sub = None
        if dead_ids:
            dying = doc_dict.join(
                spark.createDataFrame([(i,) for i in dead_ids], "doc_id long"),
                "doc_id",
                "left_semi",
            ).cache()
            n_dead, dead_len = dying.agg(
                F.count("*"), F.sum("doc_len")
            ).first()
            ids = np.array(dead_ids, dtype=np.int64)
            bc = spark.sparkContext.broadcast(ids)
            blocks = spark.read.parquet(f"{self.dir}/postings")
            # range check over metadata only; payloads of non-matching
            # blocks never cross the Arrow boundary
            hit = blocks_overlapping_ids(blocks, bc)
            decoded = hit.select(
                "term_id", "n", "doc_deltas", "tfs", "gen"
            ).mapInPandas(_decode_blocks_iter, schema=_DECODED)
            # only the CURRENT generation rows of currently-live docs
            # count toward DF (stale rows were already subtracted when
            # their generation died)
            dead_rows = decoded.join(
                dying.select("doc_id", "gen"), ["doc_id", "gen"], "left_semi"
            )
            df_sub = dead_rows.groupBy("term_id").agg(F.count("*").alias("df_sub"))
            meta["doc_num"] -= int(n_dead or 0)
            meta["total_len"] -= int(dead_len or 0)
            doc_dict = doc_dict.join(
                spark.createDataFrame([(i,) for i in dead_ids], "doc_id long"),
                "doc_id",
                "left_anti",
            )

        # ---- adds (add_doc) ----------------------------------------------
        df_add = None
        if ids_df is not None and ids_df.count() > 0:
            raw_tf = (
                term_frequencies(adds, "doc_id", "text")
                if adds is not None
                else tf_adds.filter(F.col("tf") > 0)
            )
            tf = with_effective_tf(raw_tf, self.config).cache()
            # doc stats derive from the UPSERTED ID relation, not the TF
            # rows, so zero-token docs still land in doc_dict (doc_len 0)
            # and count in doc_num — same universe as a fresh build
            new_doc_stats = (
                ids_df
                .join(
                    tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len")),
                    "doc_id",
                    "left",
                )
                .fillna({"doc_len": 0})
            )
            n_added, added_len = new_doc_stats.agg(
                F.count("*"), F.sum("doc_len")
            ).first()
            meta["doc_num"] += int(n_added or 0)
            meta["total_len"] += int(added_len or 0)

            tf_ids = tf.select(
                F.xxhash64("term").alias("term_id"), "term", "doc_id",
                F.col("tf_eff").alias("tf"),
            )
            salt_range = meta["salt_range"]
            rows = tf_ids.join(new_doc_stats, "doc_id").select(
                "term_id",
                (F.col("doc_id") / F.lit(salt_range)).cast("int").alias("salt"),
                "doc_id",
                "tf",
                "doc_len",
            )
            packed = pack_blocks_jvm(
                rows, self.config.block_size, meta["term_buckets"], gen=gen
            )
            packed.repartition(4 * int(meta.get("n_salts", 8)), "salt").sortWithinPartitions(
                "term_id", "block_seq"
            ).write.partitionBy("salt").mode("append").parquet(
                f"{self.dir}/postings"
            )
            spark.catalog.refreshByPath(f"{self.dir}/postings")

            # per-batch lineage (north rule: per-partition lineage +
            # metrics): one manifest row per salt touched by this
            # generation's blocks, computed from the WRITTEN metadata
            # columns only (payloads never read)
            written = spark.read.parquet(f"{self.dir}/postings").filter(
                F.col("gen") == gen
            )
            lineage = written.groupBy("salt").agg(
                F.sum("n").alias("rows_in"),
                F.expr(
                    "bit_xor(xxhash64(term_id, block_seq, n, min_doc, max_doc))"
                ).alias("checksum"),
            )
            (
                lineage.withColumn("phase", F.lit(f"batch_gen={gen}"))
                .withColumn("rows_out", F.col("rows_in"))
                .withColumn("ts", F.current_timestamp())
                .select("salt", "phase", "rows_in", "rows_out", "checksum", "ts")
                .write.mode("append")
                .parquet(f"{self.dir}/manifest")
            )

            df_add = tf_ids.groupBy("term_id", "term").agg(
                F.count("*").alias("df_add")
            )
            doc_dict = doc_dict.unionByName(
                new_doc_stats.select(
                    "doc_id",
                    "doc_len",
                    F.lit(0.0).alias("norm"),
                    F.lit(gen).alias("gen"),
                    *[F.lit(None).cast("string").alias(c) for c in dd_extra],
                )
            )

        # ---- stats rewrite (the IDF invalidation) -------------------------
        new_stats = term_dict.select("term_id", "term", "df")
        if df_sub is not None:
            new_stats = (
                new_stats.join(df_sub, "term_id", "left")
                .fillna({"df_sub": 0})
                .select(
                    "term_id", "term", (F.col("df") - F.col("df_sub")).alias("df")
                )
            )
        if df_add is not None:
            adds_stats = df_add.select(
                "term_id", F.col("term").alias("new_term"), "df_add"
            )
            new_stats = (
                new_stats.join(adds_stats, "term_id", "full_outer")
                .select(
                    "term_id",
                    F.coalesce("term", "new_term").alias("term"),
                    (
                        F.coalesce(F.col("df"), F.lit(0))
                        + F.coalesce(F.col("df_add"), F.lit(0))
                    ).alias("df"),
                )
            )
        new_stats = new_stats.filter(F.col("df") > 0)
        precision = meta.get("precision", "f32")
        dt = "float" if precision == "f32" else "double"
        new_term_dict = new_stats.select(
            "term_id",
            "term",
            "df",
            (F.lit(float(meta["doc_num"])) / (F.col("df") + F.lit(1.0)))
            .cast(dt)
            .alias("idf"),
        )

        meta["generation"] = gen
        had_norms = bool(meta.get("norms", False))
        if had_norms:
            # every term's idf moved -> every doc's norm is stale; never
            # leave the flag claiming otherwise (silent-wrong cosine)
            meta["norms"] = False
        # term_dict first (smaller); then doc_dict; then meta
        _swap_write(new_term_dict, f"{self.dir}/term_dict", 2)
        _swap_write(
            doc_dict.select("doc_id", "doc_len", "norm", "gen", *dd_extra),
            f"{self.dir}/doc_dict", 4,
        )
        meta["n_terms"] = int(
            spark.read.parquet(f"{self.dir}/term_dict").count()
        )
        self._write_meta(meta)
        if had_norms and refresh_norms:
            meta = self.refresh_norms()
        return meta

    # ------------------------------------------------------------------
    def set_term_counts(self, updates: DataFrame, refresh_norms: bool = False) -> dict:
        """Term-level point upsert (term.rs:113-122 `set_term_count` +
        the add_tf_vec overwrite, mod.rs:183-225): ``updates`` is
        (doc_id, term, count) — set the exact count, 0 deletes the term;
        other terms of the doc keep their current values.  Current
        values are the reference's lossy reconstruction
        (get_tf_into_term_freq through tf_denorm, mod.rs:261-309), i.e.
        the stored effective tf.  A doc whose terms all reach 0 stays
        live with doc_len 0.  Everything is a dataflow: decode only
        blocks overlapping the touched docs, outer-merge the updates,
        overwrite those docs at the next generation."""
        spark = self.spark
        updates = updates.select("doc_id", "term", F.col("count").cast("long"))
        affected = updates.select("doc_id").distinct()
        affected_ids = [r["doc_id"] for r in affected.collect()]  # batch-sized
        idx = PackedIndex(spark, self.dir, self.config)
        current = idx.get_tf(affected_ids)
        merged = (
            current.join(updates, ["doc_id", "term"], "full_outer")
            .select(
                "doc_id",
                "term",
                F.coalesce(F.col("count"), F.col("tf")).alias("tf"),
            )
            .filter(F.col("tf") > 0)
        )
        return self.apply_batch(
            tf_adds=merged, tf_add_ids=affected, refresh_norms=refresh_norms
        )

    # ------------------------------------------------------------------
    def refresh_norms(self) -> dict:
        """Recompute every doc's cosine norm against the CURRENT idf
        table (norm spans ALL doc terms weighted by current IDF,
        scoring.rs:377-395 — the same cache-invalidation rule as the
        reference's idf_cache, mod.rs:95-107).  One decode + join + agg
        job over live postings; no driver materialization."""
        spark = self.spark
        meta = self._meta()
        idx = PackedIndex(spark, self.dir, self.config)
        decoded = idx.decode_postings(None)
        live = decoded.join(
            idx.doc_dict.select("doc_id", "gen"), ["doc_id", "gen"], "left_semi"
        )
        dt = "float" if meta.get("precision", "f32") == "f32" else "double"
        w = F.col("tf").cast(dt) * F.col("idf").cast(dt)
        norms = (
            live.join(idx.term_dict.select("term_id", "idf"), "term_id")
            .groupBy("doc_id")
            .agg(F.sqrt(F.sum((w * w).cast("double"))).alias("new_norm"))
        )
        new_dd = (
            idx.doc_dict.join(norms, "doc_id", "left")
            .fillna({"new_norm": 0.0})
            .drop("norm")
            .withColumnRenamed("new_norm", "norm")
        )
        _swap_write(new_dd, f"{self.dir}/doc_dict", 4)
        meta["norms"] = True
        self._write_meta(meta)
        return meta

    # ------------------------------------------------------------------
    def compact(self) -> None:
        """Reclaim stale posting rows: decode, keep (doc_id, gen) pairs
        that match doc_dict, re-pack everything at generation 0.  No
        term-dictionary collect: liveness alone decides survival (a term
        whose df dropped to 0 simply has no live rows left)."""
        spark = self.spark
        meta = self._meta()
        idx = PackedIndex(spark, self.dir, self.config)
        decoded = idx.decode_postings(None)
        live = decoded.join(
            idx.doc_dict.select("doc_id", "gen", "doc_len"), ["doc_id", "gen"]
        )
        salt_range = meta["salt_range"]
        rows = live.select(
            "term_id",
            (F.col("doc_id") / F.lit(salt_range)).cast("int").alias("salt"),
            "doc_id",
            "tf",
            "doc_len",
        )
        packed = pack_blocks_jvm(
            rows, self.config.block_size, meta["term_buckets"], gen=0
        )
        tmp = f"{self.dir}/postings_new"
        packed.repartition(4 * int(meta.get("n_salts", 8)), "salt").sortWithinPartitions(
            "term_id", "block_seq"
        ).write.partitionBy("salt").mode("overwrite").parquet(tmp)
        old = f"{self.dir}/postings_old"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(f"{self.dir}/postings", old)
        os.rename(tmp, f"{self.dir}/postings")
        shutil.rmtree(old)
        spark.catalog.refreshByPath(f"{self.dir}/postings")
        dd_cols = idx.doc_dict.columns
        _swap_write(
            idx.doc_dict.select(
                *[F.lit(0).alias("gen") if c == "gen" else F.col(c) for c in dd_cols]
            ),
            f"{self.dir}/doc_dict",
            4,
        )
        meta["generation"] = 0
        self._write_meta(meta)


def stream_updates(
    spark: SparkSession,
    index_dir: str,
    delta_stream: DataFrame,
    config: EngineConfig = DEFAULT,
    checkpoint_dir: str | None = None,
    max_batch_rows: int = 1_000_000,
):
    """Structured Streaming ingestion surface: a stream of
    (seq, op, doc_id, text) rows applied per micro-batch via
    foreachBatch (FIXTURES.md §4 delta shape; op in add|overwrite|delete).

    Replay resolves LAST-OP-WINS per doc_id in seq order within the
    batch: a delete sequenced after an add of the same doc removes it
    from the upserts (and vice versa) — interleavings collapse to the
    state the full replay would reach.  The per-batch driver collect is
    bounded by ``max_batch_rows`` (the delta-stream contract: deltas are
    batch-sized, never corpus-sized); larger batches raise instead of
    silently OOMing the driver.

    Returns the StreamingQuery; caller awaits termination."""
    inc = IncrementalIndex(spark, index_dir, config)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.orderBy("seq").limit(max_batch_rows + 1).collect()
        if not rows:
            return
        if len(rows) > max_batch_rows:
            raise ValueError(
                f"delta micro-batch exceeds max_batch_rows={max_batch_rows}; "
                "split the stream or raise the bound"
            )
        deletes: set = set()
        upserts: dict = {}
        for r in rows:  # seq-ordered: later ops override earlier ones
            if r["op"] == "delete":
                upserts.pop(r["doc_id"], None)
                deletes.add(r["doc_id"])
            elif r["op"] in ("add", "overwrite"):
                deletes.discard(r["doc_id"])
                upserts[r["doc_id"]] = r["text"]
        adds = (
            spark.createDataFrame(
                list(upserts.items()), "doc_id long, text string"
            )
            if upserts
            else None
        )
        inc.apply_batch(adds=adds, delete_ids=sorted(deletes))

    writer = delta_stream.writeStream.foreachBatch(apply).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
