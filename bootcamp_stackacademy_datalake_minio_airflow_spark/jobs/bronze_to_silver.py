"""Generic bronze->silver ingestion job.

One config-driven job replaces the reference's 8 near-duplicate
scripts (reference: scripts/bronze_to_silver/*.py — each is the same
list/GET/parse/concat/stage/upload chain with a different table name
and column list, e.g. ingestion_customer_bronze_to_silver.py:35-99 vs
ingestion_orders_bronze_to_silver.py:36-120). The whole E/T/L chain is
one lazy plan: typed CSV scan -> (timestamps already typed by the
schema) -> parquet write. No /tmp staging, no per-object driver loop.

The timestamp casts the reference computes and then drops
(ingestion_orders_bronze_to_silver.py:66-75, SURVEY §3.1) are realized
here by typing the columns in the scan schema itself — silver carries
real TimestampType columns, which is what the gold job assumes anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import zone_path
from ..schemas import OLIST_SCHEMAS
from ..sources import read_csv, write_parquet

#: tables whose CSVs contain quoted free text with embedded newlines
#: (SURVEY §7.3) — need multiLine parsing.
MULTILINE_TABLES = {"order_reviews"}


def bronze_to_silver(
    spark: SparkSession,
    table: str,
    base: str | None = None,
    bronze_path: str | None = None,
    silver_path: str | None = None,
) -> DataFrame:
    """Ingest one Olist table bronze -> silver. Returns the DataFrame
    that was written (for chaining / testing)."""
    if table not in OLIST_SCHEMAS:
        raise ValueError(f"unknown table {table!r}; expected one of {sorted(OLIST_SCHEMAS)}")
    src = bronze_path or zone_path("bronze", table, base)
    dst = silver_path or zone_path("silver", table, base)
    df = read_csv(
        spark,
        src,
        OLIST_SCHEMAS[table],
        multi_line=table in MULTILINE_TABLES,
    )
    write_parquet(df, dst)
    return df
