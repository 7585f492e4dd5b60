from tf_idf_vectorizer_spark.operators.stats import (
    corpus_stats,
    doc_stats,
    idf_table,
)

__all__ = ["corpus_stats", "doc_stats", "idf_table"]
