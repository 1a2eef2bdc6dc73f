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

    from ..sources.csv import CSV_PARSE_OPTIONS

    # ONE option set shared with the batch reader (sources/csv.py):
    # batch backfill and streaming ingest feed the same silver zone
    # and must parse identically (review finding)
    reader = (
        spark.readStream.schema(OLIST_SCHEMAS[table])
        .options(**CSV_PARSE_OPTIONS)
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


def stream_upsert_apply(
    spark: SparkSession,
    source_dir: str,
    target_path: str,
    key: str,
    order_col: str,
    schema,
    tombstone_col: str | None = None,
    partition_col: str | None = None,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 2,
) -> StreamingQuery:
    """Streaming CDC apply: a file-source stream of change rows is
    MERGEd into a plain-parquet target per micro-batch (foreachBatch
    -> jobs.upsert.upsert_parquet) — Delta-style `MERGE INTO` stream
    semantics without a table format.

    Correct under arbitrary arrival order: within a batch the latest
    revision per key wins (row_number over ``order_col`` desc), and
    across batches the merge is version-conditional (``order_col``
    passed through to merge_upsert) with RETAINED tombstones — a hard
    delete would erase the version watermark and let a stale revision
    in a later micro-batch resurrect the key, so deletes persist as
    soft-deleted rows carrying their version. The final table then
    depends only on the SET of change rows, not on how the files were
    batched; readers filter ``NOT tombstone_col``, and a vacuum pass
    may hard-drop tombstones older than the out-of-order horizon.
    pytest drains the same change set in 1-file batches under a
    version-scrambled file layout and asserts state equality with the
    one-shot batch merge.

    Exactly-once: the checkpoint commits source offsets AFTER the
    batch's upsert publishes; a replayed batch re-merges the same
    revisions, which the version condition makes idempotent.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..jobs.upsert import upsert_parquet

    def _apply(batch_df, _batch_id: int) -> None:
        if not batch_df.take(1):
            return
        # deterministic within-batch winner: version desc, then
        # tombstone-wins on a version tie (the same tie rule the
        # cross-batch merge applies, so batching cannot flip a
        # tombstone-vs-live tie), then a content hash so equal-version
        # duplicates can never make the outcome depend on partition
        # scheduling (row_hash_cols renders map columns hashable).
        from ..functions import row_hash_cols

        tomb = (
            F.coalesce(F.col(tombstone_col), F.lit(False))
            if tombstone_col
            else F.lit(False)
        )
        w = Window.partitionBy(key).orderBy(
            F.col(order_col).desc(),
            tomb.desc(),
            F.xxhash64(F.struct(*row_hash_cols(batch_df))).desc(),
        )
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        spark_b = batch_df.sparkSession
        # bootstrap: the FIRST micro-batch against a not-yet-existing
        # target is a plain write — upsert_parquet reads the target
        # unconditionally and PATH_NOT_FOUND would kill the streaming
        # query (review finding; replace_by_group already handles the
        # analogous bootstrap)
        from ..fsutil import _fs_for, _jp

        fs, jvm = _fs_for(spark_b, target_path)
        if not fs.exists(_jp(jvm, target_path)):
            writer = latest.write.mode("overwrite")
            if partition_col:
                writer = writer.partitionBy(partition_col)
            writer.parquet(target_path)
            return
        upsert_parquet(
            spark_b,
            target_path,
            latest,
            key,
            partition_col=partition_col,
            tombstone_col=tombstone_col,
            order_col=order_col,
            retain_tombstones=tombstone_col is not None,
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    writer = stream.writeStream.foreachBatch(_apply).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
