from tf_idf_vectorizer_spark.operators.index_build import build_index, pack_blocks_jvm
from tf_idf_vectorizer_spark.operators.merge import merge_indexes
from tf_idf_vectorizer_spark.operators.stats import (
    corpus_stats,
    doc_stats,
    idf_table,
)

__all__ = [
    "build_index", "pack_blocks_jvm", "merge_indexes",
    "corpus_stats", "doc_stats", "idf_table",
]
