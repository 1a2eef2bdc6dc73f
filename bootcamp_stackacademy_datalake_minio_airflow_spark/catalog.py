"""Zone/path catalog.

The reference hard-codes bucket + object paths in every script
(reference: scripts/bronze_to_silver/ingestion_orders_bronze_to_silver.py:39,
:88-90). Here a single resolver maps (zone, table) -> URI so jobs never
embed storage layout, and the synthetic testdata directory is exposed
through the same interface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

ZONES = ("bronze", "silver", "gold")

#: tables in the driver's synthetic testdata (TESTDATA.md)
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def zone_path(zone: str, table: str, base: str | None = None) -> str:
    """Resolve a lake URI for (zone, table).

    ``base`` defaults to ``$LAKE_BASE`` (e.g. ``s3a://`` for MinIO) and
    falls back to a local directory for tests. Layout mirrors the
    reference's ``{bucket}/olist/{table}/`` prefixes.
    """
    if zone not in ZONES:
        raise ValueError(f"unknown zone {zone!r}; expected one of {ZONES}")
    base = base if base is not None else os.environ.get("LAKE_BASE", "s3a://")
    if base.endswith("://"):
        # scheme-only base ("s3a://", zone = bucket name): rstrip('/')
        # would eat the authority slashes and emit the malformed
        # 's3a:/bronze/...' (null-authority URI Hadoop rejects)
        return f"{base}{zone}/olist/{table}/"
    return f"{base.rstrip('/')}/{zone}/olist/{table}/"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic testdata table (parquet).

    The events table is written with nanosecond timestamps, which
    Spark's parquet reader rejects by default; read them as longs and
    convert to (microsecond) TimestampType.
    """
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # integer division: float division loses precision at
            # nanosecond-epoch magnitudes (~1e18 > 2^53)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
