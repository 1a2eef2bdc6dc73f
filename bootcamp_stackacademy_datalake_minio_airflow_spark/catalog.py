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


def link_donor_tables(src: str, out_dir: str, exclude: set[str]) -> None:
    """Symlink every ``*.parquet`` in ``src`` into ``out_dir`` except
    the names in ``exclude`` (tables the caller generates itself) —
    the shared donor-linking idiom for derived lakes (the prose lake,
    the scale-probe lakes), so ``load_table`` callers stay satisfied
    for tables the derived lake doesn't rescale.

    Donor changes are handled, not silently ignored (r10 self-review:
    a first-build from a smoke donor left the other nine tables
    pointing at 100x-smaller data for every later caller, and a
    deleted donor left dangling links that the copy fallback wrote
    THROUGH): a ``.donor`` stamp records ``src``; on mismatch every
    non-excluded parquet is unlinked and re-linked from the new
    donor, and stale/dangling symlinks are re-pointed individually.
    """
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    donor_stamp = os.path.join(out_dir, ".donor")
    prev_donor = (
        open(donor_stamp).read().strip()
        if os.path.exists(donor_stamp)
        else None
    )
    if prev_donor != src:
        for f_name in os.listdir(out_dir):
            if f_name.endswith(".parquet") and f_name not in exclude:
                os.unlink(os.path.join(out_dir, f_name))
        with open(donor_stamp, "w") as f:
            f.write(src)
    for f_name in sorted(os.listdir(src)):
        if not f_name.endswith(".parquet") or f_name in exclude:
            continue
        s = os.path.join(src, f_name)
        dst = os.path.join(out_dir, f_name)
        if os.path.islink(dst):
            if os.readlink(dst) == s:
                continue
            os.unlink(dst)  # stale or dangling: re-point below
        elif os.path.exists(dst):
            continue  # real copy from THIS donor (stamp matched above)
        try:
            os.symlink(s, dst)
        except OSError:
            if os.path.lexists(dst):
                os.unlink(dst)
            shutil.copyfile(s, dst)
