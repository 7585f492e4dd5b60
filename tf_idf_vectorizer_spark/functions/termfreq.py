"""The TermFrequency algebra (reference src/vectorizer/term.rs) as
DataFrame operators over the row-per-posting TF relation
``(key, term string, tf long)``.

Each function documents the reference method it reimplements.  All are
pure built-in-function compositions — no Python in the hot path — so at
cluster scale they are single-shuffle (or shuffle-free) plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def add_terms_from_freq(a: DataFrame, b: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Merge two TF relations summing counts (term.rs:127-134)."""
    return (
        a.unionByName(b)
        .groupBy(key_col, "term")
        .agg(F.sum("tf").alias("tf"))
    )


def sub_terms(tf: DataFrame, removals: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Decrement counts; drop rows hitting zero (term.rs:80-106)."""
    r = removals.select(key_col, "term", F.col("tf").alias("sub_tf"))
    return (
        tf.join(r, [key_col, "term"], "left")
        .withColumn("tf", F.col("tf") - F.coalesce(F.col("sub_tf"), F.lit(0)))
        .filter(F.col("tf") > 0)
        .drop("sub_tf")
    )


def scale_counts(tf: DataFrame, scalar: float) -> DataFrame:
    """Multiply every count by a scalar and round (term.rs:139-147)."""
    return tf.withColumn("tf", F.round(F.col("tf") * F.lit(scalar)).cast("long")).filter(
        F.col("tf") > 0
    )


def remove_stop_terms(tf: DataFrame, stops: list[str]) -> DataFrame:
    """Delete listed terms (term.rs:344-353)."""
    return tf.filter(~F.col("term").isin(stops))


def most_frequent_terms(tf: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Per-doc argmax terms WITH ties (term.rs:246-268 returns all
    max-count terms)."""
    w = Window.partitionBy(key_col).orderBy(F.desc("tf"))
    return (
        tf.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") == 1)
        .drop("rnk")
    )


def sorted_frequency_vector(tf: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Terms by count desc (term.rs:386-394); deterministic tiebreak term asc."""
    return tf.orderBy(key_col, F.desc("tf"), F.asc("term"))


def unique_term_ratio(tf: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """distinct terms / total terms per doc (term.rs:417-422)."""
    return tf.groupBy(key_col).agg(
        (F.count("*").cast("double") / F.sum("tf").cast("double")).alias("ratio")
    )


def probability_vector(tf: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """P(term | doc) = tf / doc_len (term.rs:427-460) — window agg, no
    extra shuffle beyond the TF groupBy."""
    w = Window.partitionBy(key_col)
    return tf.withColumn(
        "p", F.col("tf").cast("double") / F.sum("tf").over(w).cast("double")
    )


def top_terms_global(tf: DataFrame, k: int = 50) -> DataFrame:
    """Corpus-wide most frequent terms: total tf per term desc
    (sorted_frequency_vector lifted to the corpus level)."""
    return (
        tf.groupBy("term")
        .agg(F.sum("tf").alias("total_tf"))
        .orderBy(F.desc("total_tf"), F.asc("term"))
        .limit(k)
    )


def remove_terms_by(tf: DataFrame, predicate) -> DataFrame:
    """Retain-by-predicate (term.rs:363-379 `remove_terms_by` keeps
    entries whose (term, count) the closure REJECTS... the reference
    retains when the closure returns false; here ``predicate`` is the
    removal condition expressed as a Column over (term, tf))."""
    pred = predicate(F.col("term"), F.col("tf")) if callable(predicate) else predicate
    return tf.filter(~pred)


def sorted_dict_order_vector(tf: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Terms in dictionary (lexicographic) order per doc with their
    position (term.rs:401-409)."""
    w = Window.partitionBy(key_col).orderBy(F.asc("term"))
    return tf.withColumn("pos", F.row_number().over(w)).orderBy(
        key_col, "pos"
    )


def from_terms(spark, key, terms: list[str], key_col: str = "doc_id") -> DataFrame:
    """Constructor from a token slice (`From<&[T]>`, term.rs:150-171):
    counts duplicates, one row per distinct term."""
    rows = [(key, t) for t in terms]
    df = spark.createDataFrame(rows, f"{key_col} long, term string")
    return df.groupBy(key_col, "term").agg(F.count("*").alias("tf"))
