"""Incremental gold maintenance == full recompute, on every change
class: new order, modified items/payments, deleted order, untouched
order (whose files must not even be rewritten)."""

from __future__ import annotations

import datetime

from bootcamp_stackacademy_datalake_minio_airflow_spark.jobs.incremental_gold import (
    incremental_vendas_update,
    replace_by_group,
)
from bootcamp_stackacademy_datalake_minio_airflow_spark.plans.vendas import build_vendas

_SCHEMAS = {
    "items": "order_id string, product_id string, price double, freight_value double",
    "orders": "order_id string, customer_id string, order_purchase_timestamp timestamp",
    "products": "product_id string, product_category_name string",
    "customers": "customer_id string, customer_city string, customer_state string",
    "payments": "order_id string, payment_type string, payment_value double",
}


def _lake_v1(spark):
    ts = datetime.datetime(2017, 10, 2, 10, 0, 0)
    return {
        "items": spark.createDataFrame(
            [
                ("o1", "p1", 100.0, 10.0),
                ("o1", "p2", 50.0, 5.0),
                ("o2", "p1", 70.0, 7.0),
                ("o3", "p2", 30.0, 3.0),
            ],
            _SCHEMAS["items"],
        ),
        "orders": spark.createDataFrame(
            [("o1", "c1", ts), ("o2", "c1", ts), ("o3", "c2", ts)],
            _SCHEMAS["orders"],
        ),
        "products": spark.createDataFrame(
            [("p1", "moveis_decoracao"), ("p2", "esporte_lazer")],
            _SCHEMAS["products"],
        ),
        "customers": spark.createDataFrame(
            [("c1", "sao paulo", "SP"), ("c2", "rio", "RJ")],
            _SCHEMAS["customers"],
        ),
        "payments": spark.createDataFrame(
            [("o1", "credit_card", 150.0), ("o2", "boleto", 77.0)],
            _SCHEMAS["payments"],
        ),
    }


def _lake_v2(spark):
    """v2: o1 modified (p2 item removed, payment grew), o2 DELETED,
    o4 new; o3 untouched."""
    ts = datetime.datetime(2017, 10, 2, 10, 0, 0)
    v = _lake_v1(spark)
    v["items"] = spark.createDataFrame(
        [
            ("o1", "p1", 100.0, 10.0),
            ("o3", "p2", 30.0, 3.0),
            ("o4", "p1", 9.0, 1.0),
        ],
        _SCHEMAS["items"],
    )
    v["orders"] = spark.createDataFrame(
        [("o1", "c1", ts), ("o3", "c2", ts), ("o4", "c2", ts)],
        _SCHEMAS["orders"],
    )
    v["payments"] = spark.createDataFrame(
        [("o1", "credit_card", 199.0), ("o4", "voucher", 9.0)],
        _SCHEMAS["payments"],
    )
    return v


def _key(r):
    return (r.PEDIDO, r.ID_PRODUTO)


def test_incremental_equals_full_recompute(spark, tmp_path):
    import os

    gold = str(tmp_path / "gold_vendas")
    v1, v2 = _lake_v1(spark), _lake_v2(spark)
    build_vendas(
        v1["items"], v1["orders"], v1["products"], v1["customers"], v1["payments"]
    ).write.parquet(gold)

    changed = spark.createDataFrame(
        [("o1",), ("o2",), ("o4",)], "order_id string"
    )
    incremental_vendas_update(
        spark,
        gold,
        v2["items"],
        v2["orders"],
        v2["products"],
        v2["customers"],
        v2["payments"],
        changed,
    )
    got = {_key(r): tuple(r) for r in spark.read.parquet(gold).collect()}
    full = {
        _key(r): tuple(r)
        for r in build_vendas(
            v2["items"], v2["orders"], v2["products"], v2["customers"], v2["payments"]
        ).collect()
    }
    assert got == full
    # the change classes actually exercised:
    assert ("o2", "p1") not in got          # deleted order's rows dropped
    assert ("o1", "p2") not in got          # shrunk item list
    assert ("o4", "p1") in got              # new order inserted
    credito = spark.read.parquet(gold).columns.index("VALOR_CREDITO")
    assert got[("o1", "p1")][credito] == 199.0  # modified payment visible


def test_replace_by_group_untouched_groups_survive(spark, tmp_path):
    gold = str(tmp_path / "grp")
    spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "g string, v long"
    ).write.parquet(gold)
    new = spark.createDataFrame([("a", 9)], "g string, v long")
    replace_by_group(spark, gold, new, "g")
    got = {(r.g, r.v) for r in spark.read.parquet(gold).collect()}
    assert got == {("a", 9), ("b", 3)}
    # explicit keys: delete a group with NO new rows
    keys = spark.createDataFrame([("b",)], "g string")
    empty = spark.createDataFrame([], "g string, v long")
    replace_by_group(spark, gold, empty, "g", keys=keys)
    got = {(r.g, r.v) for r in spark.read.parquet(gold).collect()}
    assert got == {("a", 9)}


def test_snapshot_diff_change_classes(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.jobs.incremental_gold import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, None, 3.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", 2.0), (3, None, 3.0), (4, "d", 4.0)],
        "k long, s string, v double",
    )
    out = {r.k: r.change_type for r in snapshot_diff(old, new, "k").collect()}
    # 1 unchanged (absent), 2 updated, 3 unchanged incl. NULL==NULL, 4 insert
    assert out == {2: "update", 4: "insert"}
    out2 = {r.k: (r.change_type, r.s) for r in snapshot_diff(new, old, "k").collect()}
    assert out2[4] == ("delete", None)  # delete carries NULL new-values


def test_changed_groups_multiset_semantics(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.jobs.incremental_gold import (
        changed_groups,
    )

    old = spark.createDataFrame(
        [
            ("o1", "p1", 1.0), ("o1", "p2", 2.0),   # unchanged (order differs)
            ("o2", "p1", 5.0),                        # value will change
            ("o3", "p1", 7.0), ("o3", "p1", 7.0),    # one duplicate removed
            ("o4", "p9", 9.0),                        # deleted entirely
        ],
        "order_id string, product_id string, price double",
    )
    new = spark.createDataFrame(
        [
            ("o1", "p2", 2.0), ("o1", "p1", 1.0),    # same multiset, new order
            ("o2", "p1", 6.0),
            ("o3", "p1", 7.0),
            ("o5", "p1", 1.0),                        # inserted
        ],
        "order_id string, product_id string, price double",
    )
    got = {r.order_id for r in changed_groups(old, new, "order_id").collect()}
    assert got == {"o2", "o3", "o4", "o5"}


def test_incremental_from_snapshots_end_to_end(spark, tmp_path):
    """The self-maintaining loop: silver committed via snapshots,
    state bootstraps on first run (full build), second run refreshes
    only the delta, state advances, result equals full recompute."""
    from bootcamp_stackacademy_datalake_minio_airflow_spark.jobs.incremental_gold import (
        incremental_vendas_from_snapshots,
    )
    from bootcamp_stackacademy_datalake_minio_airflow_spark.jobs.snapshots import (
        commit_snapshot,
    )

    v1, v2 = _lake_v1(spark), _lake_v2(spark)
    roots = {
        t: str(tmp_path / f"silver_{t}")
        for t in ["order_items", "orders", "order_payments", "products", "customers"]
    }
    table_map = {
        "order_items": "items",
        "orders": "orders",
        "order_payments": "payments",
        "products": "products",
        "customers": "customers",
    }
    for t, k in table_map.items():
        commit_snapshot(spark, v1[k], roots[t], mode="overwrite")

    gold = str(tmp_path / "gold")
    state = str(tmp_path / "state.json")
    # cold start: NO gold table and no state -- the first run must
    # bootstrap the full build itself
    s1 = incremental_vendas_from_snapshots(spark, roots, gold, state)
    assert s1 == {
        "order_items": 1, "orders": 1, "order_payments": 1,
        "products": 1, "customers": 1,
    }
    got1 = {_key(r): tuple(r) for r in spark.read.parquet(gold).collect()}
    full1 = {
        _key(r): tuple(r)
        for r in build_vendas(
            v1["items"], v1["orders"], v1["products"], v1["customers"], v1["payments"]
        ).collect()
    }
    assert got1 == full1

    # second wave: commit v2 silver, run incrementally
    for t, k in table_map.items():
        if k in ("items", "orders", "payments"):
            commit_snapshot(spark, v2[k], roots[t], mode="overwrite")
    s2 = incremental_vendas_from_snapshots(spark, roots, gold, state)
    assert s2 == {
        "order_items": 2, "orders": 2, "order_payments": 2,
        "products": 1, "customers": 1,
    }

    got = {_key(r): tuple(r) for r in spark.read.parquet(gold).collect()}
    full = {
        _key(r): tuple(r)
        for r in build_vendas(
            v2["items"], v2["orders"], v2["products"], v2["customers"], v2["payments"]
        ).collect()
    }
    assert got == full
    # idempotent no-new-versions run: state unchanged, gold unchanged
    s3 = incremental_vendas_from_snapshots(spark, roots, gold, state)
    assert s3 == s2
    assert {_key(r): tuple(r) for r in spark.read.parquet(gold).collect()} == full


def test_mirror_to_snapshot_digest_gated(spark, tmp_path):
    """Plain-parquet bridge: first mirror commits v1; an unchanged
    re-mirror is a digest-gated no-op (no new version, no copy); a
    content change commits v2."""
    from bootcamp_stackacademy_datalake_minio_airflow_spark.jobs.snapshots import (
        mirror_to_snapshot,
        read_snapshot,
        table_versions,
    )

    src = str(tmp_path / "plain")
    root = str(tmp_path / "snap_root")
    spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string").write.parquet(src)
    assert mirror_to_snapshot(spark, src, root) == 1
    assert mirror_to_snapshot(spark, src, root) is None  # unchanged
    assert table_versions(spark, root) == [1]

    spark.createDataFrame([(1, "a"), (2, "B")], "k long, s string").write.mode(
        "overwrite"
    ).parquet(src)
    assert mirror_to_snapshot(spark, src, root) == 2
    assert {r.s for r in read_snapshot(spark, root).collect()} == {"a", "B"}


def test_dimension_change_refreshes_joined_orders(spark, tmp_path):
    """Review-finding pin: a products-only snapshot commit (facts
    unchanged) must refresh the gold rows of orders that JOIN the
    changed product — fact-only tracking left them permanently
    stale."""
    from bootcamp_stackacademy_datalake_minio_airflow_spark.jobs.incremental_gold import (
        incremental_vendas_from_snapshots,
    )
    from bootcamp_stackacademy_datalake_minio_airflow_spark.jobs.snapshots import (
        commit_snapshot,
    )
    from bootcamp_stackacademy_datalake_minio_airflow_spark.plans.vendas import build_vendas

    v1 = _lake_v1(spark)
    roots = {
        t: str(tmp_path / f"s_{t}")
        for t in ["order_items", "orders", "order_payments", "products", "customers"]
    }
    table_map = {
        "order_items": "items", "orders": "orders",
        "order_payments": "payments", "products": "products",
        "customers": "customers",
    }
    for t, k in table_map.items():
        commit_snapshot(spark, v1[k], roots[t], mode="overwrite")
    gold = str(tmp_path / "gold")
    state = str(tmp_path / "state.json")
    incremental_vendas_from_snapshots(spark, roots, gold, state)

    # correct one product's category; commit ONLY the products snapshot
    from pyspark.sql import functions as F

    some_pid = v1["items"].select("product_id").first()[0]
    fixed = v1["products"].withColumn(
        "product_category_name",
        F.when(F.col("product_id") == some_pid, F.lit("corrigida"))
        .otherwise(F.col("product_category_name")),
    )
    commit_snapshot(spark, fixed, roots["products"], mode="overwrite")
    s = incremental_vendas_from_snapshots(spark, roots, gold, state)
    assert s["products"] == 2

    got = {_key(r): tuple(r) for r in spark.read.parquet(gold).collect()}
    full = {
        _key(r): tuple(r)
        for r in build_vendas(
            v1["items"], v1["orders"], fixed, v1["customers"], v1["payments"]
        ).collect()
    }
    assert got == full  # the corrected category reached gold
