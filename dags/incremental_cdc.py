"""Airflow DAG for the INCREMENTAL path (extension; the reference's
DAGs are all full-recompute "@once" runs).

Hourly cycle: diff each silver input against its previous snapshot
(jobs/incremental_gold.snapshot_diff), collect the changed order set,
refresh only those orders' gold rows (incremental_vendas_update), and
run the retention vacuum for CDC tombstones past the lateness
horizon. The gold Dataset publishes so downstream consumers (the JDBC
publish DAG) stay event-driven.

Import-guarded like dags/olist_medallion.py: the engine never needs
Airflow at runtime.
"""

from __future__ import annotations

import datetime

try:
    from airflow import DAG, Dataset
    from airflow.operators.python import PythonOperator
except ImportError:  # pragma: no cover - Airflow not installed in test env
    DAG = Dataset = PythonOperator = None

#: silver tables whose changes can alter gold vendas rows
FACT_INPUTS = ["order_items", "orders", "order_payments"]


def _run_incremental_gold() -> None:
    from pyspark.sql import functions as F

    from bootcamp_stackacademy_datalake_minio_airflow_spark.catalog import zone_path
    from bootcamp_stackacademy_datalake_minio_airflow_spark.jobs.incremental_gold import (
        incremental_vendas_update,
        snapshot_diff,
    )
    from bootcamp_stackacademy_datalake_minio_airflow_spark.session import get_spark

    spark = get_spark("incremental_vendas", with_s3=True)
    read = lambda t: spark.read.parquet(zone_path("silver", t))  # noqa: E731
    prev = lambda t: spark.read.parquet(zone_path("silver", f"{t}__prev"))  # noqa: E731

    changed = None
    for t in FACT_INPUTS:
        feed = snapshot_diff(prev(t), read(t), "order_id").select("order_id")
        changed = feed if changed is None else changed.unionByName(feed)
    changed = changed.distinct()
    incremental_vendas_update(
        spark,
        zone_path("gold", "vendas"),
        read("order_items"),
        read("orders"),
        spark.read.parquet(zone_path("silver", "products")),
        spark.read.parquet(zone_path("silver", "customers")),
        read("order_payments"),
        changed,
    )


def _run_tombstone_vacuum() -> None:
    import datetime as dt

    from bootcamp_stackacademy_datalake_minio_airflow_spark.catalog import zone_path
    from bootcamp_stackacademy_datalake_minio_airflow_spark.jobs.upsert import (
        vacuum_tombstones,
    )
    from bootcamp_stackacademy_datalake_minio_airflow_spark.session import get_spark

    spark = get_spark("tombstone_vacuum", with_s3=True)
    horizon = (dt.datetime.utcnow() - dt.timedelta(days=7)).isoformat()
    vacuum_tombstones(
        spark, zone_path("silver", "orders_cdc"), "deleted", "updated_at", horizon
    )


if DAG is not None:  # pragma: no cover
    default_args = {
        "owner": "data-eng",
        "depends_on_past": False,
        "start_date": datetime.datetime(2024, 1, 1),
        "retries": 1,
    }
    gold_vendas_ds = Dataset("s3a://gold/vendas")
    silver_ds = [Dataset(f"s3a://silver/{t}") for t in FACT_INPUTS]

    with DAG(
        "incremental_vendas_gold",
        default_args=default_args,
        schedule=silver_ds,  # event-driven on any fact input's publish
        catchup=False,
        tags=["gold", "incremental"],
    ) as dag_inc:
        inc = PythonOperator(
            task_id="incremental_vendas_update",
            python_callable=_run_incremental_gold,
            outlets=[gold_vendas_ds],
        )

    with DAG(
        "cdc_tombstone_vacuum",
        default_args=default_args,
        schedule="17 2 * * *",
        catchup=False,
        tags=["maintenance", "cdc"],
    ) as dag_vac:
        PythonOperator(
            task_id="vacuum_tombstones",
            python_callable=_run_tombstone_vacuum,
        )
