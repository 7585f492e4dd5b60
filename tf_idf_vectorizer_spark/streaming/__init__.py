from tf_idf_vectorizer_spark.streaming.incremental import (
    IncrementalIndex,
    stream_updates,
)

__all__ = ["IncrementalIndex", "stream_updates"]
