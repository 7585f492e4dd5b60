from tf_idf_vectorizer_spark.sources.corpus import (
    extract_text,
    load_corpus,
    load_documents,
)

__all__ = ["load_corpus", "load_documents", "extract_text"]
