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


def session_windowed_counts(
    spark: SparkSession,
    events_path: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows (dynamic-length gaps, the streaming twin of the
    batch lag+cumsum sessionizer in ``q_sessionize_events``): events per
    (user_id, session), session closed after ``gap`` of inactivity.

    ``F.session_window`` keeps per-key open-session state bounded by the
    watermark — at scale state is partitioned by the grouping key, the
    same shuffle shape as any keyed streaming aggregation.
    Returns (user_id, session_start, session_end, n) drained as batch.
    """
    import os
    import shutil
    import tempfile

    schema = spark.read.parquet(events_path).schema
    if os.path.isfile(events_path):
        d = tempfile.mkdtemp(prefix="stream_src_")
        shutil.copy(events_path, os.path.join(d, os.path.basename(events_path)))
        events_path = d
    stream = spark.readStream.schema(schema).parquet(events_path)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
    )
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        f"SELECT user_id, w.start AS session_start, w.end AS session_end, n FROM {name}"
    )


def streaming_dedup(
    spark: SparkSession,
    events_path: str,
    key_cols: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: ``dropDuplicatesWithinWatermark`` keeps one
    row per key with state expired past the watermark — the streaming twin
    of the batch ``dedup.exact_dups``. At scale, dedup state is hash-
    partitioned by key and bounded by the watermark horizon (the unbounded
    ``dropDuplicates`` variant would grow state forever on an infinite
    stream). Returns the deduped rows drained as batch."""
    import os
    import shutil
    import tempfile

    schema = spark.read.parquet(events_path).schema
    if os.path.isfile(events_path):
        d = tempfile.mkdtemp(prefix="stream_src_")
        shutil.copy(events_path, os.path.join(d, os.path.basename(events_path)))
        events_path = d
    stream = spark.readStream.schema(schema).parquet(events_path)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    deduped = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        key_cols or ["event_id"]
    )
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")
