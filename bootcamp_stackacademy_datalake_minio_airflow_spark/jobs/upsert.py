"""MERGE/upsert emulation for plain-parquet lake tables.

Plain parquet has no transactional MERGE (that's Delta/Iceberg
territory); the lake-engine equivalent rewrites the target from a
full-outer join of target x updates:

    matched  -> take the update's values  (WHEN MATCHED THEN UPDATE)
    new      -> insert the update row     (WHEN NOT MATCHED THEN INSERT)
    deletes  -> optional anti-filter      (WHEN MATCHED AND tombstone)

The rewrite is partition-prunable: with ``partition_col``, only
partitions present in the updates are rewritten (classic
overwrite-by-partition), so a day's upsert touches a day's files, not
the whole table — the property that keeps MERGE viable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    tombstone_col: str | None = None,
) -> DataFrame:
    """Return the merged table: updates win on key collision, new keys
    append, and rows whose update has ``tombstone_col = true`` drop."""
    cols = target.columns
    if tombstone_col and tombstone_col in updates.columns:
        deletes = updates.filter(F.col(tombstone_col)).select(key)
        updates = updates.filter(~F.col(tombstone_col)).drop(tombstone_col)
        target = target.join(deletes, key, "left_anti")
    t = target.alias("t")
    u = updates.alias("u")
    joined = t.join(u, on=key, how="full_outer")
    merged = joined.select(
        F.coalesce(F.col(f"u.{key}"), F.col(f"t.{key}")).alias(key),
        *[
            F.when(F.col(f"u.{key}").isNotNull(), F.col(f"u.{c}"))
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
            for c in cols
            if c != key
        ],
    )
    return merged


def upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    partition_col: str | None = None,
    tombstone_col: str | None = None,
) -> None:
    """Apply ``merge_upsert`` against a parquet path in place.

    With ``partition_col``: reads ONLY the partitions the updates
    touch, merges, and overwrites just those partition directories
    (dynamic partition overwrite) — the rest of the table's files are
    untouched.
    """
    if partition_col:
        parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
        target = spark.read.parquet(path).filter(F.col(partition_col).isin(parts))
        merged = merge_upsert(target, updates, key, tombstone_col)
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(path)
        )
    else:
        target = spark.read.parquet(path)
        merged = merge_upsert(target, updates, key, tombstone_col)
        # full rewrite: stage then swap would be used on object stores;
        # local overwrite reads lazily so materialize first
        merged_rows = merged.collect()
        spark.createDataFrame(merged_rows, merged.schema).write.mode("overwrite").parquet(path)
