"""Streaming PSI drift monitor — the stream twin of
operators/analytics.py:population_stability_index.

Shape: the streaming aggregation maintains the PSI's ENTIRE state —
``(bucket, n_a, n_b)`` counts over fixed-edge buckets, at most
``n_buckets`` rows by construction — in update mode; a foreachBatch
accumulator applies each revision and re-scores with the SAME
``psi_from_counts`` report the batch operator uses, so stream and
batch verdicts come from one implementation and the pytest twin just
drains the stream and compares against the batch report on identical
data.

No watermark: documents carry no event time and the aggregation
state is bounded by the bucket count, not by the stream's length —
this is the rare streaming aggregation whose state CANNOT grow. The
foreachBatch collect is bounded the same way (|buckets| rows). A
deployment that wants durability swaps the in-memory dict for a
parquet/Delta upsert keyed by bucket; the report stage is already a
pure function of the counts table.
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
)

from ..operators.analytics import psi_bucket_counts, psi_from_counts
from .bounds import bounded_collect

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

COUNTS_SCHEMA = StructType(
    [
        StructField("bucket", LongType()),
        StructField("n_a", LongType()),
        StructField("n_b", LongType()),
    ]
)


def stream_psi_monitor(
    spark: SparkSession,
    source_dir: str,
    *,
    split_source: str = "src0",
    value_col: str = "n_chars",
    bucket_width: float = 100.0,
    n_buckets: int = 10,
    max_files_per_trigger: int = 4,
) -> tuple[StreamingQuery, list]:
    """Start the drift monitor over a documents file stream; returns
    ``(query, report)`` where ``report`` is re-assigned after every
    micro-batch with the CURRENT PSI rows (same schema as the batch
    operator's output: bucket, n_a, n_b, pa, pb, contrib). UPDATE
    mode re-emits revised buckets, so the accumulator converges to
    the exact bucket table even when a bucket's rows span
    micro-batches."""
    state: dict[int, tuple[int, int]] = {}
    report: list = []

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        # bounded: <= n_buckets rows (psi_bucket_counts clamps the bucket
        # id to [0, n_buckets-1] on both ends) — and ENFORCED: a clamp
        # regression raises instead of growing driver state
        rows = bounded_collect(
            batch_df, n_buckets, "stream_psi_monitor bucket-counts batch"
        )
        for r in rows:
            state[r["bucket"]] = (r["n_a"], r["n_b"])
        snap = spark.createDataFrame(
            [(b, na, nb) for b, (na, nb) in state.items()], COUNTS_SCHEMA
        )
        report[:] = psi_from_counts(
            snap, n_buckets=n_buckets
        ).collect()

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    counts = psi_bucket_counts(
        stream,
        value_col,
        F.col("source") == split_source,
        bucket_width=bucket_width,
        n_buckets=n_buckets,
    )
    writer = (
        counts.writeStream.outputMode("update")
        .foreachBatch(_apply)
        .trigger(availableNow=True)
    )
    return writer.start(), report
