"""Streaming windowed aggregation (SURVEY.md §2.2 streaming row).

Structured Streaming over a parquet directory with tumbling event-time
windows; ``availableNow`` + the in-memory sink drains the available data
synchronously, so the same computation is batch-checkable against a
``time_bucket`` SQL oracle.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


def windowed_event_counts(
    spark: SparkSession,
    events_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts per event_type via readStream → writeStream.

    Returns the drained result as a batch DataFrame:
    (ws timestamp, event_type, n, total_value).
    """
    import os
    import shutil
    import tempfile

    schema = spark.read.parquet(events_path).schema
    if os.path.isfile(events_path):
        # the streaming file source requires a directory — stage the file
        d = tempfile.mkdtemp(prefix="stream_src_")
        shutil.copy(events_path, os.path.join(d, os.path.basename(events_path)))
        events_path = d
    stream = spark.readStream.schema(schema).parquet(events_path)
    # event-time columns must be TIMESTAMP (not NTZ); session zone is UTC so
    # the wall clock is preserved
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    name = f"win_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        f"SELECT w.start AS ws, event_type, n, total_value FROM {name}"
    )
