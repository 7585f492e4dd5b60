"""tf_idf_vectorizer_spark — a PySpark-native inverted-index + BM25 engine.

A brand-new, Spark-first reimplementation of the query and data-processing
capabilities of the Rust crate ``371tti/tf-idf-vectorizer`` (reference at
/root/reference, v0.10.5): TF/DF/IDF corpus statistics, an inverted index,
a boolean query algebra, four scoring functions (contains / dot / cosine /
BM25), and top-k retrieval — plus the large-scale training-data pipeline
operators (dedup, similarity search, text QC, multimodal plumbing) that a
100 TB web-text corpus needs.

Everything is declared with the DataFrame API so Catalyst picks the
physical plan; Python only runs inside Arrow-vectorized pandas UDFs
(posting-block codec, WAND pruning kernels).

Layout:
    sources/     corpus adapters (documents.parquet -> web-page shape),
                 html extraction
    functions/   tokenization + TF, the TermFrequency algebra
    operators/   corpus stats (DF/IDF), dictionaries, posting codec,
                 index build (salted, two-phase), corpus set-ops
    query/       boolean AST, candidate sets, exact scorers, block-max WAND
    pipeline/    dedup, ANN similarity, text QC, multimodal stubs
    streaming/   incremental index maintenance (foreachBatch)
    plans/       plan inspection helpers (explain capture for bench/tests)
"""

from tf_idf_vectorizer_spark.config import EngineConfig

__version__ = "0.2.0"

__all__ = ["EngineConfig", "__version__"]


def __getattr__(name):  # lazy: keep `import tf_idf_vectorizer_spark` cheap
    if name in ("build_index", "merge_indexes"):
        from tf_idf_vectorizer_spark import operators

        return getattr(operators, name)
    if name == "PackedIndex":
        from tf_idf_vectorizer_spark.query.packed import PackedIndex

        return PackedIndex
    if name == "ExactSearcher":
        from tf_idf_vectorizer_spark.query.exact import ExactSearcher

        return ExactSearcher
    if name == "IncrementalIndex":
        from tf_idf_vectorizer_spark.streaming import IncrementalIndex

        return IncrementalIndex
    raise AttributeError(name)
