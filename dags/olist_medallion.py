"""Airflow DAGs for the medallion pipeline (reference O1-O5).

The reference defines 9 DAGs (8 bronze->silver + vendas) whose
cross-DAG ordering is implicit — nothing forces silver to exist before
the gold job runs (reference: scripts/silver_to_gold/
ingestion_vendas_silver_to_gold.py:20 is another independent "@once"
DAG). Here Airflow Datasets make the dependency explicit: each silver
load publishes its dataset; the gold DAG is scheduled on all five
datasets the vendas query consumes.

Each task is a single Spark job (E/T/L fused into one lazy plan,
SURVEY §3.1 "Spark shape") — no PythonOperator staging chain, no
BashOperator /tmp cleanup (reference :93-118).

Import-guarded: the engine never requires Airflow at runtime; this
module is only imported by an Airflow scheduler.
"""

from __future__ import annotations

import datetime

try:
    from airflow import DAG, Dataset
    from airflow.operators.python import PythonOperator
except ImportError:  # pragma: no cover - Airflow not installed in test env
    DAG = Dataset = PythonOperator = None

TABLES = [
    "customers",
    "sellers",
    "geolocation",
    "products",
    "orders",
    "order_items",
    "order_payments",
    "order_reviews",
]

VENDAS_INPUTS = ["order_items", "orders", "products", "customers", "order_payments"]


def _run_bronze_to_silver(table: str) -> None:
    from bootcamp_stackacademy_datalake_minio_airflow_spark.jobs import bronze_to_silver
    from bootcamp_stackacademy_datalake_minio_airflow_spark.session import get_spark

    bronze_to_silver(get_spark(f"bronze_to_silver_{table}", with_s3=True), table)


def _run_vendas_gold() -> None:
    from bootcamp_stackacademy_datalake_minio_airflow_spark.jobs import vendas_gold
    from bootcamp_stackacademy_datalake_minio_airflow_spark.session import get_spark

    vendas_gold(get_spark("vendas_gold", with_s3=True))


def _run_publish() -> None:
    from bootcamp_stackacademy_datalake_minio_airflow_spark.jobs import publish_vendas_jdbc
    from bootcamp_stackacademy_datalake_minio_airflow_spark.session import get_spark

    publish_vendas_jdbc(get_spark("vendas_publish", with_s3=True))


if DAG is not None:  # pragma: no cover
    default_args = {
        "owner": "data-eng",
        "depends_on_past": False,
        "start_date": datetime.datetime(2024, 1, 1),
        "retries": 1,
    }

    # URIs derived from the lake-layout resolver (NOT literals):
    # Airflow matches Datasets by exact URI string, so every producer
    # and consumer must mint URIs from the same function or the
    # event-driven wiring silently never fires
    from bootcamp_stackacademy_datalake_minio_airflow_spark.catalog import zone_path

    silver_ds = {t: Dataset(zone_path("silver", t)) for t in TABLES}

    for t in TABLES:
        with DAG(
            dag_id=f"ingestion_{t}_bronze_to_silver",
            default_args=default_args,
            schedule="@once",
            catchup=False,
        ) as dag:
            PythonOperator(
                task_id=f"bronze_to_silver_{t}",
                python_callable=_run_bronze_to_silver,
                op_args=[t],
                outlets=[silver_ds[t]],
            )
        globals()[dag.dag_id] = dag

    with DAG(
        dag_id="ingestion_vendas_silver_to_gold",
        default_args=default_args,
        schedule=[silver_ds[t] for t in VENDAS_INPUTS],
        catchup=False,
    ) as vendas_dag:
        gold = PythonOperator(task_id="vendas_gold", python_callable=_run_vendas_gold)
        publish = PythonOperator(task_id="venda_to_mysql", python_callable=_run_publish)
        gold >> publish
    globals()[vendas_dag.dag_id] = vendas_dag
