"""Unit tests for pivot-sum and star left-join (SURVEY §2.3-§2.4)."""

from __future__ import annotations

from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.joins import star_left_join
from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.pivot import pivot_sum


def test_pivot_sum_multi_payment_order(spark):
    # an order with two credit_card rows must SUM, not reshape (SURVEY §2.4)
    pays = spark.createDataFrame(
        [
            ("o1", "credit_card", 10.0),
            ("o1", "credit_card", 5.0),
            ("o1", "voucher", 2.0),
            ("o2", "boleto", 7.0),
        ],
        "order_id string, payment_type string, payment_value double",
    )
    out = pivot_sum(
        pays, "order_id", "payment_type", "payment_value",
        values=["boleto", "credit_card", "voucher"],
    )
    rows = {r.order_id: r for r in out.collect()}
    assert rows["o1"].credit_card == 15.0
    assert rows["o1"].voucher == 2.0
    assert rows["o1"].boleto is None  # missing combo -> NULL (filled later)
    assert rows["o2"].boleto == 7.0


def test_pivot_sum_pinned_values_fix_schema(spark):
    pays = spark.createDataFrame(
        [("o1", "boleto", 1.0)],
        "order_id string, payment_type string, payment_value double",
    )
    out = pivot_sum(
        pays, "order_id", "payment_type", "payment_value",
        values=["boleto", "credit_card"],
    )
    assert out.columns == ["order_id", "boleto", "credit_card"]


def test_star_left_join_null_extension(spark):
    # unmatched fact rows survive with NULL dim columns (pandas merge parity)
    fact = spark.createDataFrame([("o1", 1.0), ("o2", 2.0)], "order_id string, price double")
    dim = spark.createDataFrame([("o1", "c1")], "order_id string, customer_id string")
    out = star_left_join(fact, [(dim, "order_id", True)])
    rows = {r.order_id: r for r in out.collect()}
    assert rows["o1"].customer_id == "c1"
    assert rows["o2"].customer_id is None
    assert len(rows) == 2


def test_star_left_join_no_duplicate_key_columns(spark):
    fact = spark.createDataFrame([("o1",)], "order_id string")
    dim = spark.createDataFrame([("o1", 5)], "order_id string, x int")
    out = star_left_join(fact, [(dim, "order_id", False)])
    assert out.columns == ["order_id", "x"]
