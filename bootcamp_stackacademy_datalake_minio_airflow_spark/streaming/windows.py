"""Windowed aggregations over the events stream (extension).

The reference is batch-only ("@once" DAGs, SURVEY §2.7). Here the
events table gets the standard streaming treatment: the SAME windowed
aggregation expression serves batch (oracle-checkable) and streaming
(readStream + watermark) — one definition, two execution modes, which
is exactly how Structured Streaming is meant to be used.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def tumbling_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts + value sums per event_type.

    Works on both batch and streaming DataFrames (the streaming entry
    point below adds the watermark before calling this)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_user_activity(
    events: DataFrame, window: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding-window distinct-user activity (batch or streaming)."""
    return (
        events.groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.approx_count_distinct("user_id").alias("approx_users"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "approx_users",
        )
    )


def events_stream_tumbling(
    spark: SparkSession,
    source_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    checkpoint_dir: str | None = None,
    output_table: str = "events_windowed",
    max_files_per_trigger: int = 8,
    output_mode: str = "update",
) -> StreamingQuery:
    """File-source streaming ingest of events with tumbling-window
    aggregation and late-data watermark; writes to an in-memory sink
    (swap for a parquet/kafka sink in production).

    ``output_mode`` picks the completeness/uniqueness trade-off:

    - ``update`` (default): every trigger emits the windows it
      revised, so with trigger(availableNow) ALL windows — including
      ones the watermark never passed before the source drained —
      reach the sink; a window spanning several micro-batches appears
      once per revision, and consumers take the latest row per key.
      This is the complete-data mode for a drain-and-stop run.
    - ``append``: a window row is emitted exactly once, when the
      watermark passes its end — no duplicate keys ever, but windows
      still open when the source drains are NEVER emitted (the sink
      permanently misses the trailing ~watermark of data). Use for
      continuous streams feeding exactly-once sinks.

    The watermark bounds state: windows older than max(event time) -
    watermark are finalized and evicted, so state size is O(active
    windows), not O(stream length) — the property that matters for an
    unbounded 100 TB/day stream.
    """
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
        .withWatermark("ts", watermark)
    )
    agg = tumbling_counts(stream, window)
    writer = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(output_table)
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
