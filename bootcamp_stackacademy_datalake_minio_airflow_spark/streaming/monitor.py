"""Streaming rate monitor — the stream twin of
operators/temporal.py:rate_anomalies.

Shape: watermarked tumbling hourly counts per event type (bounded
state, same as windows.py), delivered in UPDATE mode to a foreachBatch
that maintains the hourly-count table and re-scores it with the SAME
``score_hourly_rates`` core the batch detector uses — so stream and
batch verdicts come from one implementation, and the pytest twin
simply drains the stream and compares against the batch operator on
identical data.

Scale note, stated honestly: the hourly table is |types| x |hours| BY
CONSTRUCTION (the corpus collapses in the streaming aggregation before
anything reaches the driver), so the foreachBatch collect is bounded
and tiny — it is the aggregation STATE that scales with the stream,
and the watermark bounds that. For a deployment where even the hourly
table is large (millions of types x years), swap the in-memory
accumulator for a parquet/Delta upsert and run the scorer as a batch
job over it; the scoring core is already shared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.temporal import score_hourly_rates
from .bounds import bounded_collect
from .windows import EVENTS_SCHEMA

HOURLY_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("hour_ts", TimestampType()),
        StructField("n_events", LongType()),
    ]
)


def hourly_type_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour counts per event type (batch or streaming) —
    a rename over windows.tumbling_counts so the one windowed
    aggregation implementation serves both the windows suite and this
    monitor (review finding: a second near-identical groupBy-window
    here would fork future fixes)."""
    from .windows import tumbling_counts

    return tumbling_counts(events, "1 hour").select(
        "event_type",
        F.col("window_start").alias("hour_ts"),
        F.col("n_events").cast("long").alias("n_events"),
    )


def stream_rate_monitor(
    spark: SparkSession,
    source_dir: str,
    *,
    watermark: str = "30 days",
    lookback: int = 24,
    z_cutoff: float = 2.5,
    max_files_per_trigger: int = 8,
    state_budget: int = 200_000,
) -> tuple[StreamingQuery, list]:
    """Start the monitor; returns ``(query, alerts)`` where ``alerts``
    is re-assigned after every micro-batch with the CURRENT anomaly
    rows (same schema as the batch detector's output). UPDATE mode
    re-emits revised windows, so the accumulator converges to the
    exact hourly table even when a window spans micro-batches.

    The default watermark is deliberately LONG (30 days): a file
    source replays history in modification-time order, not event-time
    order, so a short watermark can silently discard whole spans of
    out-of-order history (review finding). The monitor's streaming
    state is hourly counts — |types| x |watermark hours| rows — so a
    month of tolerance costs almost nothing; tighten it only for a
    live feed whose arrival order is genuinely near-event-time.

    No checkpoint parameter on purpose: the alert accumulator lives in
    this call, so resuming a checkpointed query in a NEW call would
    skip already-processed files while starting from an EMPTY
    accumulator — silently wrong alerts. A durable deployment swaps
    the in-memory dict for a parquet/Delta upsert (see module note)
    and only then adds a checkpoint.
    """
    state: dict[tuple, int] = {}
    alerts: list = []

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        # bounded: |types| x |hours revised| — and ENFORCED: a cardinality
        # blow-up (e.g. a high-cardinality type column) raises instead of
        # growing driver state without limit
        rows = bounded_collect(
            batch_df, state_budget, "stream_rate_monitor hourly-counts batch"
        )
        for r in rows:
            state[(r["event_type"], r["hour_ts"])] = r["n_events"]
        if len(state) > state_budget:
            raise RuntimeError(
                "stream_rate_monitor: accumulated hourly-count state "
                f"exceeds state_budget={state_budget} keys; raise the "
                "budget or move the accumulator to a parquet/Delta upsert"
            )
        snap = spark.createDataFrame(
            [(t, h, n) for (t, h), n in state.items()], HOURLY_SCHEMA
        )
        scored = score_hourly_rates(
            snap, lookback=lookback, z_cutoff=z_cutoff
        ).collect()
        alerts[:] = scored

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
        .withWatermark("ts", watermark)
    )
    writer = (
        hourly_type_counts(stream)
        .writeStream.outputMode("update")
        .foreachBatch(_apply)
        .trigger(availableNow=True)
    )
    return writer.start(), alerts
