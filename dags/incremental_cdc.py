"""Airflow DAG for the INCREMENTAL path (extension; the reference's
DAGs are all full-recompute "@once" runs).

Event-driven cycle: whenever a fact input's silver Dataset publishes,
refresh the gold mart for exactly the orders whose rows changed since
the last processed snapshot version — the snapshot-version-driven
runner (jobs/incremental_gold.incremental_vendas_from_snapshots)
owns the whole loop: version bookkeeping in a CAS-committed state
manifest, multiset-digest change detection per fact table
(changed_groups — order-grain, safe for the multi-row-per-order
items/payments tables), semi-join-pruned rebuild, group-replace
publish. A nightly job vacuums retained CDC tombstones past the
lateness horizon.

Dataset URIs are DERIVED from catalog.zone_path so producers and this
consumer can never drift apart on the lake layout (Airflow matches
Datasets by exact URI string).

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
VENDAS_INPUTS = [*FACT_INPUTS, "products", "customers"]


def _run_incremental_gold() -> None:
    from bootcamp_stackacademy_datalake_minio_airflow_spark.catalog import zone_path
    from bootcamp_stackacademy_datalake_minio_airflow_spark.jobs.incremental_gold import (
        incremental_vendas_from_snapshots,
    )
    from bootcamp_stackacademy_datalake_minio_airflow_spark.jobs.snapshots import (
        mirror_to_snapshot,
    )
    from bootcamp_stackacademy_datalake_minio_airflow_spark.session import get_spark

    spark = get_spark("incremental_vendas", with_s3=True)
    # Bridge: the medallion jobs overwrite plain-parquet silver in
    # place, so first mirror each input into its snapshot root
    # (digest-gated no-op when unchanged). A silver writer that
    # commits through jobs.snapshots natively makes this a pure no-op.
    roots = {
        t: zone_path("silver", t).rstrip("/") + "__snapshots"
        for t in VENDAS_INPUTS
    }
    for t in VENDAS_INPUTS:
        mirror_to_snapshot(spark, zone_path("silver", t), roots[t])
    incremental_vendas_from_snapshots(
        spark,
        silver_roots=roots,
        gold_path=zone_path("gold", "vendas"),
        state_path=zone_path("gold", "vendas").rstrip("/")
        + "__incremental_state.json",
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
    from bootcamp_stackacademy_datalake_minio_airflow_spark.catalog import zone_path

    default_args = {
        "owner": "data-eng",
        "depends_on_past": False,
        "start_date": datetime.datetime(2024, 1, 1),
        "retries": 1,
    }
    gold_vendas_ds = Dataset(zone_path("gold", "vendas"))
    silver_ds = [Dataset(zone_path("silver", t)) for t in FACT_INPUTS]

    with DAG(
        "incremental_vendas_gold",
        default_args=default_args,
        schedule=silver_ds,  # event-driven on any fact input's publish
        catchup=False,
        tags=["gold", "incremental"],
    ) as dag_inc:
        PythonOperator(
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
