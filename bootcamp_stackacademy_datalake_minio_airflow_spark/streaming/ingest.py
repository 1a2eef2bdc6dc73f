"""Streaming bronze->silver ingestion (extension; SURVEY §7 M5).

The reference ingests bronze CSVs in a batch "@once" DAG. This is the
continuous form: a file-source stream watches the bronze prefix,
parses with the same pinned Olist schemas, and appends typed parquet
to silver exactly-once (checkpointed offsets + idempotent file sink).
``availableNow`` runs it as an incremental batch — the lambda-free
pattern where backfill and streaming share one code path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..catalog import zone_path
from ..jobs.bronze_to_silver import MULTILINE_TABLES
from ..schemas import OLIST_SCHEMAS


def stream_bronze_to_silver(
    spark: SparkSession,
    table: str,
    checkpoint_dir: str,
    base: str | None = None,
    bronze_path: str | None = None,
    silver_path: str | None = None,
    max_files_per_trigger: int = 32,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously ingest one Olist table's bronze CSVs to silver.

    ``max_files_per_trigger`` bounds micro-batch size (ingest
    backpressure); the checkpoint makes restarts resume from the last
    committed file set. Returns the running StreamingQuery.
    """
    if table not in OLIST_SCHEMAS:
        raise ValueError(f"unknown table {table!r}; expected one of {sorted(OLIST_SCHEMAS)}")
    src = bronze_path or zone_path("bronze", table, base)
    dst = silver_path or zone_path("silver", table, base)

    reader = (
        spark.readStream.schema(OLIST_SCHEMAS[table])
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .option("recursiveFileLookup", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
    )
    if table in MULTILINE_TABLES:
        reader = reader.option("multiLine", "true")
    stream = reader.csv(src)

    writer = (
        stream.writeStream.format("parquet")
        .option("path", dst)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
