"""Stream-stream joins (extension; reference is batch-only).

Event attribution — match each purchase to the same user's preceding
views within a bounded gap — as ONE join definition consumed by both
execution modes: the batch twin is oracle-checkable against DuckDB,
the streaming form is a watermarked stream-stream self-join whose
state Spark can GC (the time-range condition plus both watermarks
bound how long a buffered row can still find a partner, which is what
keeps state finite on an unbounded stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .windows import EVENTS_SCHEMA


def attribution_join(
    views: DataFrame, purchases: DataFrame, max_gap: str = "6 hours"
) -> DataFrame:
    """Inner join views->purchases per user with ``view_ts <=
    purchase_ts <= view_ts + max_gap``.

    Works on batch and streaming inputs unchanged. Batch plan: one
    hash shuffle on user_id (the equi-key), the range bounds evaluate
    as join residuals — never a cartesian. Streaming plan: both sides
    keyed by user_id into the join state store; a buffered view is
    droppable once the purchase-side watermark passes ``view_ts +
    max_gap``, a buffered purchase once the view-side watermark
    passes ``purchase_ts`` — so state is O(events inside the gap
    horizon), not O(stream).
    """
    v = views.select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("__p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    joined = v.join(
        p,
        (F.col("user_id") == F.col("__p_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {max_gap}")),
    )
    return joined.select(
        "user_id",
        "view_id",
        "purchase_id",
        "view_ts",
        "purchase_ts",
        # ts is TIMESTAMP_NTZ (no long cast); unix_seconds over the
        # session-TZ cast (UTC -> identity) floors to epoch seconds,
        # matching the oracle's floor(epoch(ts)) boundary count
        (
            F.unix_seconds(F.col("purchase_ts").cast("timestamp"))
            - F.unix_seconds(F.col("view_ts").cast("timestamp"))
        ).alias("gap_s"),
    )


def batch_attribution(events: DataFrame, max_gap: str = "6 hours") -> DataFrame:
    """Batch twin over one events table (the oracle-checked form)."""
    return attribution_join(
        events.filter(F.col("event_type") == "view"),
        events.filter(F.col("event_type") == "purchase"),
        max_gap=max_gap,
    )


def stream_attribution(
    spark: SparkSession,
    source_dir: str,
    max_gap: str = "6 hours",
    watermark: str = "12 hours",
    checkpoint_dir: str | None = None,
    output_table: str = "attribution_pairs",
    max_files_per_trigger: int = 4,
) -> StreamingQuery:
    """File-source stream-stream self-join: one readStream, two
    filtered branches, each with its own watermark, inner-joined with
    the time-range condition. Inner-join rows emit as soon as both
    partners have arrived (append mode never withholds inner matches;
    the watermark only drives STATE CLEANUP), so a drain-and-stop run
    emits every pair the batch twin produces."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    views = stream.filter(F.col("event_type") == "view").withWatermark(
        "ts", watermark
    )
    purchases = stream.filter(F.col("event_type") == "purchase").withWatermark(
        "ts", watermark
    )
    pairs = attribution_join(views, purchases, max_gap=max_gap)
    writer = (
        pairs.writeStream.outputMode("append")
        .format("memory")
        .queryName(output_table)
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
