"""Structured Streaming idioms over the engine's relations.

The reference has no streaming surface (SURVEY.md §2.8) — its notion of
"streaming" is per-doc add/del (mod.rs:118-259), which
``streaming/incremental.py`` maps to foreachBatch micro-batches.  This
module adds the two idioms a web-scale ingest pipeline pairs with that:

  * event-time windowed aggregation WITH a watermark — late events
    beyond the watermark are dropped and window state is reclaimed
    (state size stays bounded at 10^12-event scale);
  * a custom stateful operator via ``applyInPandasWithState``: running
    document-frequency per term across micro-batches — the streaming
    form of ``Corpus::add_set`` (corpus/mod.rs:57-68), state = one
    count per term group, Arrow-batched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time tumbling-window counts/sums with a watermark.  Works
    on a stream (late data beyond the watermark dropped, state
    reclaimed) and, with the same code, on a batch frame (watermark is
    a no-op there) — tested for equality between the two."""
    # watermarks require TIMESTAMP (with zone); the corpus tables carry
    # TIMESTAMP_NTZ — cast is exact under the engine's UTC session tz
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


_DF_STATE_SCHEMA = "df long"
_DF_OUT_SCHEMA = "term string, df long"


def _df_update(key, pdfs, state: GroupState):
    """Per-term state update: df += #new docs containing the term in
    this micro-batch (input rows are DISTINCT (term, doc_id))."""
    import pandas as pd

    new = sum(len(pdf) for pdf in pdfs)
    (prev,) = state.get if state.exists else (0,)
    total = prev + new
    state.update((total,))
    yield pd.DataFrame({"term": [key[0]], "df": [total]})


def running_term_df(tf_stream: DataFrame) -> DataFrame:
    """Streaming ``Corpus::add_set``: maintain a running document
    frequency per term across micro-batches with
    ``applyInPandasWithState``.  Input: a stream of (doc_id, term) rows
    (distinct per doc within a batch — the TF relation's key set).
    Output stream: (term, df) — the updated counts each batch."""
    return (
        tf_stream.groupBy("term")
        .applyInPandasWithState(
            _df_update,
            outputStructType=_DF_OUT_SCHEMA,
            stateStructType=_DF_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
