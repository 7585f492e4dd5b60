"""Corpus source adapters.

The engine's external-facing input is an Iceberg/Parquet table of
Common-Crawl-style web pages with columns
``(url string, warc_ts timestamp, html binary, text string, lang string)``
(the BASELINE.json input_hint).  The reference crate itself has no file
sources — documents enter as in-memory term->count maps
(/root/reference/src/vectorizer/mod.rs:118-181); its companion harness read
Wikipedia dumps.  Here the table IS the ingest surface.

The driver ships ``documents.parquet`` with columns
``(doc_id, text, lang, source, n_chars)``; ``load_corpus`` adapts it onto
the web-page shape deterministically (FIXTURES.md §1):

  * ``url      = 'synth://' || source || '/' || doc_id``
  * ``warc_ts  = timestamp '2024-01-01' + doc_id seconds``
  * ``html     = utf-8 bytes of a fixed wrapper around text``

``extract_text`` recovers ``text`` from ``html`` byte-identically per url
(the north-rule invariant) with an Arrow-vectorized pandas UDF — no
per-row Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_HTML_PREFIX = "<html><head><title>"
_HTML_MID = "</title></head><body><p>"
_HTML_SUFFIX = "</p></body></html>"


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw driver-generated documents table (doc_id, text, lang, ...)."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def synth_url() -> Column:
    return F.concat(
        F.lit("synth://"), F.col("source"), F.lit("/"), F.col("doc_id").cast("string")
    )


def load_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> web-page-shaped corpus table.

    The html wrapper embeds the url in <title> and the text in <p>; the
    whole pipeline is built-in expressions (JVM-side, codegen'd).
    """
    docs = load_documents(spark, sf_dir)
    html_str = F.concat(
        F.lit(_HTML_PREFIX),
        synth_url(),
        F.lit(_HTML_MID),
        F.col("text"),
        F.lit(_HTML_SUFFIX),
    )
    return docs.select(
        synth_url().alias("url"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


@F.pandas_udf(StringType())
def _extract_text_udf(html: pd.Series) -> pd.Series:
    """Vectorized html -> text extraction.

    For the synthetic wrapper this is an exact inverse (byte-identical per
    url, verified in tests).  Real-world extraction (trafilatura etc.)
    would slot in here; the Spark-side plumbing is identical.
    """
    s = html.apply(lambda b: b.decode("utf-8", errors="replace") if b is not None else None)
    # strip everything up to the first <p> and the trailing wrapper
    body = s.str.split("<body><p>", n=1).str[-1]
    return body.str.removesuffix(_HTML_SUFFIX)


def extract_text(corpus: DataFrame) -> DataFrame:
    """Add ``extracted_text`` (must equal ``text`` byte-identically)."""
    return corpus.withColumn("extracted_text", _extract_text_udf(F.col("html")))
