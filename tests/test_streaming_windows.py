"""Structured Streaming idioms: watermarked windowed aggregation and a
custom stateful operator (applyInPandasWithState running-DF)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tf_idf_vectorizer_spark.streaming.windows import (
    running_term_df,
    windowed_event_counts,
)

SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def test_windowed_counts_stream_equals_batch(spark, sf_smoke, tmp_path):
    """The same windowed-agg code on a stream (availableNow) and on the
    batch frame produces identical rows."""
    events = spark.read.parquet(f"{sf_smoke}/events.parquet")
    batch = windowed_event_counts(events).collect()

    src = str(tmp_path / "events_dir")  # file stream source needs a DIR
    events.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM win_counts").collect()

    key = lambda r: (r["win_start"], r["event_type"])  # noqa: E731
    gb = {key(r): (r["n"], round(r["sum_value"], 9)) for r in batch}
    gs = {key(r): (r["n"], round(r["sum_value"], 9)) for r in got}
    assert gb == gs and len(gb) > 0


def test_running_term_df_stateful(spark, tmp_path):
    """applyInPandasWithState accumulates DF across micro-batches
    (maxFilesPerTrigger=1 forces one batch per input file); the final
    per-term state equals the batch DF over all docs."""
    b1 = [(0, "spark"), (0, "join"), (1, "spark")]
    b2 = [(2, "spark"), (2, "merge"), (3, "join")]
    src = str(tmp_path / "tf_src")
    spark.createDataFrame(b1, "doc_id long, term string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    spark.createDataFrame(b2, "doc_id long, term string").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, term string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_term_df(stream)
        .writeStream.format("memory")
        .queryName("run_df")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM run_df").collect()
    # update mode emits one row per term per batch it appeared in; the
    # LAST emission per term is the running total
    final: dict[str, int] = {}
    for r in rows:  # memory sink preserves batch order
        final[r["term"]] = r["df"]
    assert final == {"spark": 3, "join": 2, "merge": 1}
    # intermediate state was really incremental: spark seen twice
    spark_vals = [r["df"] for r in rows if r["term"] == "spark"]
    assert len(spark_vals) >= 2 and spark_vals[0] < spark_vals[-1]


def test_watermark_drops_late_events(spark, tmp_path):
    """Append mode + watermark: an event arriving AFTER the watermark
    passed its window is dropped (state stays bounded), and only
    finalized windows are emitted."""
    from datetime import datetime as dt

    src = str(tmp_path / "late_src")
    b1 = [
        (1, dt(2024, 1, 1, 10, 0), "click", 1.0),
        (2, dt(2024, 1, 1, 10, 30), "click", 2.0),
        (3, dt(2024, 1, 1, 14, 0), "click", 4.0),  # advances watermark to 12:00
    ]
    b2 = [(4, dt(2024, 1, 1, 10, 45), "click", 8.0)]  # LATE: < watermark
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.mode("overwrite").parquet(src)

    sink = str(tmp_path / "late_sink")

    def run_once():
        # the watermark persists in the CHECKPOINT between runs, so the
        # second availableNow run sees b2 against watermark 12:00
        # (file sink: memory sinks cannot recover from a checkpoint)
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = (
            windowed_event_counts(stream, window="1 hour", watermark="2 hours")
            .writeStream.format("parquet")
            .outputMode("append")  # only windows the watermark has closed
            .option("path", sink)
            .option("checkpointLocation", str(tmp_path / "late_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    run_once()
    rows = {
        r["win_start"].hour: (r["n"], r["sum_value"])
        for r in spark.read.parquet(sink).collect()
    }
    # the 10:00 window finalized with the ON-TIME rows only; the late
    # 10:45 event (value 8.0) was dropped; 14:00 never finalized
    assert rows == {10: (2, 3.0)}, rows
