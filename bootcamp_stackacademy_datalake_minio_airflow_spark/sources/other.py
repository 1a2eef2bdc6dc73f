"""JSON / ORC sources & sinks, JDBC source (absent in the reference —
SURVEY §2.1 lists them as missing; a complete engine provides them).

Avro is intentionally omitted: it requires the external
spark-avro package, which this environment cannot install. Wire
``format("avro")`` the same way once the package ships with the
cluster image.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    multi_line: bool = False,
    corrupt_col: str | None = None,
) -> DataFrame:
    """JSON-lines scan (one object per line scales — each file splits
    by line; ``multi_line`` single-document files do not split).

    ``corrupt_col`` enables quarantine ingestion, mirroring
    ``sources/csv.py``: undecodable lines land with their raw text in
    that column (PERMISSIVE mode) instead of silently nulling or — at
    lake scale, worse — FAILFAST sinking a multi-TB ingest on one bad
    crawler record. Requires an explicit ``schema`` (with inference
    Spark drops the corrupt column after the inference pass). Same
    caveat as CSV: select at least one real column alongside the
    corrupt column before filtering on it alone.
    """
    from pyspark.sql.types import StringType, StructField

    reader = spark.read
    if corrupt_col is not None:
        if schema is None:
            raise ValueError("corrupt_col quarantine requires an explicit schema")
        schema = StructType(
            list(schema.fields) + [StructField(corrupt_col, StringType(), True)]
        )
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_col
        )
    if schema is not None:
        reader = reader.schema(schema)  # skip the inference pass
    if multi_line:
        reader = reader.option("multiLine", "true")
    return reader.json(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    user: str | None = None,
    password: str | None = None,
    driver: str = "com.mysql.cj.jdbc.Driver",
) -> DataFrame:
    """Parallel JDBC source (the reference only writes to MySQL).

    With ``partition_column`` + bounds, Spark issues ``num_partitions``
    range-predicate queries in parallel; without them the read is a
    single cursor — fine for dimension tables, never for facts.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            # str(None) would reach the JVM as the literal 'None' and
            # die in a NumberFormatException far from the caller
            raise ValueError(
                "partition_column requires explicit lower_bound and "
                "upper_bound (e.g. SELECT min(col), max(col) first)"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    return reader.load()
