from tf_idf_vectorizer_spark.query.ast import Query, parse_sexpr
from tf_idf_vectorizer_spark.query.exact import ExactSearcher

__all__ = ["Query", "parse_sexpr", "ExactSearcher"]
