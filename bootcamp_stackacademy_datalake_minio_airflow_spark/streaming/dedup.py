"""Streaming deduplication + stream-static enrichment (extension;
absent in reference).

At ingest time a training-data pipeline sees the same document again
and again (re-crawls, retries, at-least-once upstream queues). Two
streaming forms, both bounded-state:

- ``stream_dedup_exact``: drop repeats of a key within the watermark
  horizon via ``dropDuplicatesWithinWatermark`` — state is one entry
  per key seen inside the horizon, and the watermark GC's expired
  entries, so state size is bounded by arrival rate x horizon (a
  plain ``dropDuplicates`` on an unbounded stream grows state
  forever).
- ``stream_enrich_static``: broadcast-join each micro-batch against a
  slow-changing dimension (e.g. a source/domain quality table). The
  static side re-broadcasts per batch; the stream side never
  shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup_exact(
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exactly-once-per-key output within the watermark horizon.

    Late re-arrivals beyond ``watermark`` are admitted again (their
    dedup state was GC'd) — the at-scale contract is "no duplicates
    within the horizon, idempotent sink beyond it", which is what
    keeps state bounded on an infinite stream.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_enrich_static(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    how: str = "left",
) -> DataFrame:
    """Enrich a stream with a static dimension via broadcast join.

    Stream-static joins are stateless (no watermark bookkeeping): each
    micro-batch re-executes the dimension scan. Caveat that matters in
    production: a file-based ``dim`` (``spark.read.parquet(...)``)
    snapshots its FILE LISTING at DataFrame creation — re-execution
    re-reads the same files, so dimension files added later are never
    seen and replaced files can fail mid-stream. For a dimension that
    changes while the stream runs, re-create the DataFrame per batch
    inside ``foreachBatch`` (or use a table format whose snapshot the
    scan re-resolves).
    """
    return stream.join(F.broadcast(dim), on=on, how=how)
