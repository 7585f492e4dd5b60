"""SparkSession factory tuned for the engine.

Local testing runs on ``local[N]`` (single JVM); the conf below is chosen
so the same code scales to a multi-executor cluster: AQE on (runtime
shuffle-partition coalescing + skew-join splitting), Arrow on (every
Python kernel is a vectorized pandas UDF), small broadcast threshold kept
at default so dimension/dictionary joins broadcast automatically.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tf-idf-vectorizer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    processor_count: int | None = None,
) -> SparkSession:
    """processor_count pins -XX:ActiveProcessorCount so a local[N]
    session behaves like a genuine N-CPU executor (otherwise GC/JIT/
    netty pools size to the PHYSICAL core count and a 'small' session
    borrows hidden parallelism — this skews scaling measurements)."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "500000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        # v2 committer: task-side renames (v1 renames every output file
        # sequentially on the driver — serial wall time at 1000+ files)
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.ui.enabled", "false")
    )
    if processor_count:
        builder = builder.config(
            "spark.driver.extraJavaOptions",
            f"-XX:ActiveProcessorCount={processor_count}",
        )
    return builder.getOrCreate()
