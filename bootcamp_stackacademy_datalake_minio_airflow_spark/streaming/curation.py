"""Streaming curation funnel — the stream twin of
operators/funnel.py:funnel_report.

A live ingest wants the same "which rule is eating my crawl" report
continuously as documents arrive. The attribution CASE chain is
stateless map-side work, so the streaming aggregation state is just
the per-rule kill counts — ≤|rules|+1 rows however large the stream —
emitted in COMPLETE mode (cumulative totals each micro-batch; the
accumulator ASSIGNS, never adds, so revisions cannot double-count).
The report is re-derived every batch by the SAME
``funnel_report_from_counts`` arithmetic the batch operator uses, so
stream and batch verdicts come from one implementation and the pytest
twin just drains the stream and compares against ``funnel_report`` on
identical data.

Scale note, stated honestly: the foreachBatch collect is bounded by
the rule count BY CONSTRUCTION (the corpus collapses in the streaming
aggregation before anything reaches the driver). The stream itself
never shuffles more than the count aggregation's partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from ..operators.funnel import SURVIVOR, funnel_attribution, funnel_report_from_counts
from .bounds import bounded_collect


def stream_funnel_monitor(
    spark: SparkSession,
    source_dir: str,
    rules: list[tuple[str, Column]],
    schema: StructType,
    *,
    id_col: str = "doc_id",
    max_files_per_trigger: int = 8,
) -> tuple[StreamingQuery, list]:
    """Start the funnel monitor over a parquet file stream; returns
    ``(query, report)`` where ``report`` is re-assigned after every
    micro-batch with the CURRENT stage rows (same schema as the batch
    ``funnel_report``).

    COMPLETE output mode: the unwindowed count aggregation re-emits
    the full cumulative per-rule table each batch (tiny by rule
    count), and the accumulator overwrites — an UPDATE-mode += here
    would double-count every revised rule (the rate monitor's
    assignment convention, same reasoning). No checkpoint parameter on
    purpose, same as stream_rate_monitor: the accumulator lives in
    this call, so a resumed query would skip files while starting from
    an empty dict — silently wrong counts.
    """
    state: dict[str, int] = {}
    report: list = []

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        # bounded: ≤ |rules|+1 rows (one per rule plus the survivor
        # marker) — and ENFORCED: a grouping regression raises instead
        # of growing driver state
        rows = bounded_collect(
            batch_df, len(rules) + 1, "stream_funnel_monitor rule-counts batch"
        )
        for r in rows:
            state[r["rule"]] = r["n_killed"]
        snap = spark.createDataFrame(
            [(k, v) for k, v in state.items()], "rule string, n_killed long"
        )
        report[:] = sorted(
            funnel_report_from_counts(snap, rules).collect(),
            key=lambda row: row["stage"],
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    counts = (
        funnel_attribution(stream, rules, id_col)
        .groupBy(F.coalesce("killed_by", F.lit(SURVIVOR)).alias("rule"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_killed"))
    )
    writer = (
        counts.writeStream.outputMode("complete")
        .foreachBatch(_apply)
        .trigger(availableNow=True)
    )
    return writer.start(), report
