"""JDBC sink (reference S9).

Replaces the SQLAlchemy full-replace load (reference:
scripts/silver_to_gold/ingestion_vendas_silver_to_gold.py:173-180,
``to_sql(..., if_exists='replace')`` = drop & recreate) with Spark's
parallel JDBC writer. ``overwrite`` without ``truncate`` matches the
reference's drop-and-recreate semantics exactly (SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    mode: str = "overwrite",
    num_partitions: int = 8,
    batch_size: int = 10_000,
    driver: str = "com.mysql.cj.jdbc.Driver",
) -> None:
    """Parallel INSERT into an RDBMS table.

    ``num_partitions`` bounds concurrent connections (repartition down
    if the plan has more); ``batch_size`` batches INSERTs per round
    trip. At gold-table scale this is the difference between one
    serial cursor (the reference) and N writers saturating the DB's
    ingest capacity.
    """
    writer = (
        df.repartition(num_partitions)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("numPartitions", str(num_partitions))
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    if user is not None:
        writer = writer.option("user", user)
    if password is not None:
        writer = writer.option("password", password)
    writer.save()
