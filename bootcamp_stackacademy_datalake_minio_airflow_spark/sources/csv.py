"""CSV source (reference S1-S4 fused).

Replaces the reference's list-objects + per-object GET + pandas parse
+ concat loop (reference: scripts/bronze_to_silver/
ingestion_orders_bronze_to_silver.py:39-59) with one declarative scan:
Spark enumerates every file under the prefix, parses in parallel on
executors, and the pinned schema removes the inference pass (at 100 TB
an inference pass is a full extra read of the data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    multi_line: bool = False,
    timestamp_format: str = "yyyy-MM-dd HH:mm:ss",
) -> DataFrame:
    """Typed CSV scan over a file/directory/prefix.

    ``multi_line=True`` is required for tables with quoted free-text
    fields containing embedded newlines (Olist order_reviews — the
    reference relies on pandas' parser handling these; Spark needs the
    option explicitly, SURVEY §7.3). multiLine disables input-split
    parallelism per file, so keep review-like tables in many smaller
    files at scale.
    """
    reader = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("timestampFormat", timestamp_format)
        .option("recursiveFileLookup", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
    )
    if multi_line:
        reader = reader.option("multiLine", "true")
    return reader.csv(path)
