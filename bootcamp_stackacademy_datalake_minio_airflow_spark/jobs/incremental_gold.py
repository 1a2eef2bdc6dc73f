"""Incremental gold maintenance (extension; reference recomputes gold
in full).

The reference's vendas job rebuilds the whole mart on every run
(ingestion_vendas_silver_to_gold.py:38-162 recomputes everything from
silver). At 100 TB that is the difference between touching a day's
changed orders and re-joining the entire history — so this module
maintains the gold mart INCREMENTALLY, the materialized-view way:

    1. given the set of changed order ids (from CDC, streaming ingest,
       or a bronze-arrival diff), semi-join-prune every fact-side
       input to just those orders,
    2. run the UNCHANGED build_vendas plan on the pruned inputs (same
       semantics, tiny data), and
    3. publish with delete-insert by group: the gold rows of exactly
       the changed orders are replaced, everything else's files are
       untouched bytes.

Group replace (not row upsert) is the correct primitive here because
the mart's grain is order ITEMS: an order whose item list shrank must
lose rows, which per-row upsert cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.vendas import build_vendas


def replace_by_group(
    spark: SparkSession,
    path: str,
    new_rows: DataFrame,
    group_key: str,
    keys: DataFrame | None = None,
) -> None:
    """Delete-insert by group key against a parquet path: target rows
    whose ``group_key`` is in ``keys`` are dropped, ``new_rows`` are
    appended, and the result swap-publishes via staging + rename
    (never an in-place overwrite of a path this job reads).

    ``keys`` defaults to the distinct keys OF ``new_rows`` — pass it
    explicitly when groups may have been DELETED entirely (a deleted
    order produces no new rows, so deriving keys from new_rows would
    silently keep its stale gold rows).

    Scale shape: the key set is dimension-sized (a day's changed
    orders), so the anti-join broadcasts; the rewrite cost is the
    surviving table scan + new rows, with no wide shuffle.
    """
    from ..fsutil import publish_swap, recover_swaps

    recover_swaps(spark, path)
    key_df = (keys if keys is not None else new_rows).select(group_key).distinct()
    target = spark.read.parquet(path)
    kept = target.join(F.broadcast(key_df), group_key, "left_anti")
    merged = kept.unionByName(new_rows.select(*target.columns))
    staging = f"{path.rstrip('/')}__staging"
    merged.write.mode("overwrite").parquet(staging)
    publish_swap(spark, staging, path)


def incremental_vendas_update(
    spark: SparkSession,
    gold_path: str,
    order_items: DataFrame,
    orders: DataFrame,
    products: DataFrame,
    customers: DataFrame,
    order_payments: DataFrame,
    changed_orders: DataFrame,
    **build_kwargs,
) -> None:
    """Refresh the vendas gold mart for exactly ``changed_orders``
    (a one-column ``order_id`` DataFrame: created, modified, AND
    deleted orders).

    Every fact-side input is pruned with a broadcast semi-join BEFORE
    the star join, so the whole build_vendas plan — pivot included —
    runs over only the changed orders' rows; dimensions were broadcast
    in the full plan already and stay whole. The result replaces those
    orders' gold rows by group (see replace_by_group). An order absent
    from the pruned silver (deleted) contributes no rows and its gold
    rows are dropped — full-recompute parity, verified in pytest.
    """
    ch = F.broadcast(changed_orders.select("order_id").distinct())
    sub = build_vendas(
        order_items.join(ch, "order_id", "left_semi"),
        orders.join(ch, "order_id", "left_semi"),
        products,
        customers,
        order_payments.join(ch, "order_id", "left_semi"),
        **build_kwargs,
    )
    # build_vendas renames order_id -> PEDIDO (or the mapping's name)
    renames = build_kwargs.get("renames")
    group_key = (renames or {}).get("order_id", "PEDIDO")
    keys = changed_orders.select(F.col("order_id").alias(group_key)).distinct()
    replace_by_group(spark, gold_path, sub, group_key, keys=keys)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change feed between two versions of a table: one row per
    changed key with ``change_type`` in {'insert','update','delete'}
    and the NEW values (NULLs for deletes) — the Delta CDF shape,
    derived from plain snapshots.

    This is the producer side of the CDC pipeline (stream_upsert_apply
    is the consumer): diff yesterday's and today's silver, feed the
    changes to the incremental gold update. One full-outer hash join
    on the key; ``compare_cols`` limits the update-detection to
    columns that matter (default: all non-key columns shared by both
    sides). Unchanged keys are filtered out BEFORE any downstream
    shuffle."""
    cols = compare_cols or [c for c in new.columns if c != key and c in old.columns]
    o, n = old.alias("o"), new.alias("n")
    joined = o.join(n, on=key, how="full_outer")
    # NULL-safe per-column comparison: <=> treats NULL==NULL as true
    same = F.lit(True)
    for c in cols:
        same = same & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    change = (
        F.when(F.col(f"o.{key}").isNull(), F.lit("insert"))
        .when(F.col(f"n.{key}").isNull(), F.lit("delete"))
        .when(~same, F.lit("update"))
    )
    return (
        joined.select(
            F.coalesce(F.col(f"n.{key}"), F.col(f"o.{key}")).alias(key),
            change.alias("change_type"),
            *[F.col(f"n.{c}").alias(c) for c in cols],
        )
        .filter(F.col("change_type").isNotNull())
    )
