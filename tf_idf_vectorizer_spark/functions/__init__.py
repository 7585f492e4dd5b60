from tf_idf_vectorizer_spark.functions.tokenize import term_frequencies, tokenize

__all__ = ["tokenize", "term_frequencies"]
