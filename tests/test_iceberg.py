"""Iceberg integration (availability-gated: this container ships no
iceberg-spark-runtime jar, so the round-trip test skips; with the jar on
the classpath it runs unchanged)."""

from __future__ import annotations

import pytest

from tf_idf_vectorizer_spark.sources import iceberg as ice


def test_availability_probe_is_safe(spark):
    """The probe never raises — it gates every Iceberg call site."""
    assert ice.iceberg_available(spark) in (True, False)


def test_publish_raises_cleanly_without_runtime(spark, tmp_path):
    if ice.iceberg_available(spark):
        pytest.skip("runtime present; covered by the round-trip test")
    with pytest.raises(RuntimeError, match="classpath"):
        ice.publish_index(spark, str(tmp_path), "ns")


def test_iceberg_round_trip(spark, sf_smoke, tmp_path):
    """Self-activating when the runtime jar lands on the classpath
    (availability-gated, NOT hard-skipped): build -> publish -> read
    back -> same postings multiset, a catalog-served PackedIndex answers
    the same top-k, and the stats snapshot id drives stats_generation."""
    if not ice.iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime jar not on the classpath")
    from tf_idf_vectorizer_spark.config import EngineConfig
    from tf_idf_vectorizer_spark.operators.index_build import build_index
    from tf_idf_vectorizer_spark.query.packed import PackedIndex
    from tf_idf_vectorizer_spark.sources import load_documents

    # catalog wiring at runtime: DataSourceV2 catalogs resolve lazily,
    # so conf set on a live session works (the SQL-extension half of
    # configure_iceberg is only needed for MERGE/CALL statements)
    spark.conf.set(
        f"spark.sql.catalog.{ice.CATALOG}",
        "org.apache.iceberg.spark.SparkCatalog",
    )
    spark.conf.set(f"spark.sql.catalog.{ice.CATALOG}.type", "hadoop")
    spark.conf.set(
        f"spark.sql.catalog.{ice.CATALOG}.warehouse", str(tmp_path / "wh")
    )
    cfg = EngineConfig(n_salts=4, block_size=64, term_buckets=16)
    out = str(tmp_path / "idx")
    build_index(spark, load_documents(spark, sf_smoke), out, config=cfg)
    snaps = ice.publish_index(spark, out, "tfidf_test")
    assert snaps["term_dict"] is not None
    back = ice.read_table(spark, "tfidf_test", "postings")
    assert back.count() == spark.read.parquet(f"{out}/postings").count()
    assert ice.stats_generation(spark, "tfidf_test") == snaps["term_dict"]
    # a catalog-served index answers identically to the parquet one and
    # exposes the snapshot id as its IDF generation source
    pq = PackedIndex(spark, out, cfg)
    cat = PackedIndex.from_iceberg(spark, "tfidf_test", cfg)
    want = [tuple(r) for r in pq.bm25_topk(["spark", "join"], k=5).collect()]
    got = [tuple(r) for r in cat.bm25_topk(["spark", "join"], k=5).collect()]
    assert got == want
    assert cat.stats_generation() == snaps["term_dict"]
