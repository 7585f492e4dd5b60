from tf_idf_vectorizer_spark.streaming.incremental import (
    IncrementalIndex,
    stream_updates,
)
from tf_idf_vectorizer_spark.streaming.windows import (
    running_term_df,
    windowed_event_counts,
)

__all__ = [
    "IncrementalIndex", "stream_updates",
    "running_term_df", "windowed_event_counts",
]
