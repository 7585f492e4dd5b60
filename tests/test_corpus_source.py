"""Input adapter + html extraction invariants (north rule: byte-identical
extracted text per url)."""

from pyspark.sql import functions as F

from tf_idf_vectorizer_spark.sources import extract_text, load_corpus


def test_corpus_shape(spark, sf_smoke):
    corpus = load_corpus(spark, sf_smoke)
    assert [f.name for f in corpus.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]
    types = {f.name: f.dataType.simpleString() for f in corpus.schema.fields}
    assert types["html"] == "binary"
    assert types["warc_ts"] == "timestamp"
    assert corpus.count() == 500
    assert corpus.select("url").distinct().count() == 500


def test_extraction_byte_identical(spark, sf_smoke):
    corpus = load_corpus(spark, sf_smoke)
    ext = extract_text(corpus)
    mismatches = ext.filter(
        ~(F.col("extracted_text").eqNullSafe(F.col("text")))
    ).count()
    assert mismatches == 0
