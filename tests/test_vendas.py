"""Flagship vendas plan: semantics on a tiny in-code Olist-shaped fixture
plus the sf0.001 smoke (mirrors the driver's t1 check)."""

from __future__ import annotations

import datetime

from bootcamp_stackacademy_datalake_minio_airflow_spark.plans.vendas import (
    build_vendas,
    vendas_testdata,
)


def _olist_fixture(spark):
    items = spark.createDataFrame(
        [("o1", "p1", 100.0, 10.0), ("o1", "p2", 50.0, 5.0), ("o9", "p1", 7.0, 1.0)],
        "order_id string, product_id string, price double, freight_value double",
    )
    orders = spark.createDataFrame(
        [("o1", "c1", datetime.datetime(2017, 10, 2, 10, 56, 33))],
        "order_id string, customer_id string, order_purchase_timestamp timestamp",
    )
    products = spark.createDataFrame(
        [("p1", "moveis_decoracao")],
        "product_id string, product_category_name string",
    )
    customers = spark.createDataFrame(
        [("c1", "sao paulo", "SP")],
        "customer_id string, customer_city string, customer_state string",
    )
    payments = spark.createDataFrame(
        [("o1", "credit_card", 120.0), ("o1", "credit_card", 30.0), ("o1", "voucher", 15.0)],
        "order_id string, payment_type string, payment_value double",
    )
    return items, orders, products, customers, payments


def test_vendas_semantics(spark):
    df = build_vendas(*_olist_fixture(spark))
    rows = {(r.PEDIDO, r.ID_PRODUTO): r for r in df.collect()}
    assert len(rows) == 3  # one row per order item, fact preserved

    r = rows[("o1", "p1")]
    assert r.VALOR_VENDA == 100.0 and r.FRETE == 10.0
    assert r.DATA_VENDA == datetime.date(2017, 10, 2)  # ts -> date
    assert r.CATEGORIA_PRODUTO == "MOVEIS DECORACAO"  # upper + '_'->' '
    assert r.CIDADE_CLIENTE == "SAO PAULO" and r.ESTADO_CLIENTE == "SP"
    assert r.VALOR_CREDITO == 150.0  # SUM of two credit_card rows
    assert r.VALOR_VOUCHER == 15.0
    assert r.VALOR_BOLETO == 0.0  # pivot hole null-filled

    # order o9 has no order header: null dims, 0-filled payments (§3.2 note)
    r9 = rows[("o9", "p1")]
    assert r9.ID_CLIENTE is None and r9.DATA_VENDA is None
    assert r9.CIDADE_CLIENTE is None
    assert r9.VALOR_CREDITO == 0.0

    # p2 has no product row -> NULL category survives upper() (null-preserving)
    assert rows[("o1", "p2")].CATEGORIA_PRODUTO is None


def test_vendas_smoke_sf0001(spark, sf_dir):
    df = vendas_testdata(spark, sf_dir)
    assert df.count() > 0
    assert "VALOR_VENDA" in df.columns and "PEDIDO" in df.columns


def test_vendas_plan_broadcasts_dims(spark, sf_dir):
    plan = vendas_testdata(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # dims must not shuffle the fact table
