"""Corpus set-operations (reference src/vectorizer/corpus/mod.rs).

A "corpus" here is its stats relation ``(term, df long)`` plus a doc
count — the reference's ``Corpus`` DashMap flattened to rows.  Both ops
are single full-outer/union aggregations; at scale the small side should
be broadcast by the caller when it fits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def delta_corpus(a: DataFrame, b: DataFrame) -> DataFrame:
    """Per-term positive difference a-b, dropping <=0 rows
    (corpus/mod.rs:125-142 — trend analysis between two corpora)."""
    bb = b.select("term", F.col("df").alias("df_b"))
    return (
        a.join(bb, "term", "full_outer")
        .select(
            "term",
            F.greatest(
                F.coalesce(F.col("df"), F.lit(0)) - F.coalesce(F.col("df_b"), F.lit(0)),
                F.lit(0),
            ).alias("df"),
        )
        .filter(F.col("df") > 0)
    )


def merge_corpus(a: DataFrame, b: DataFrame) -> DataFrame:
    """Element-wise sum of DF counts (corpus/mod.rs:145-158) — the
    stats half of the reference's sharded build + merge pattern."""
    return (
        a.unionByName(b)
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
    )
