"""Round-6 breadth: skew-join demonstration at bench scale (VERDICT
r5 next-round #8) plus further coverage growth.

The salted-distinct operator (operators/maintenance.py,
``events_salted_distinct_users``) proved the SALTING cure; this suite
adds the planted-hot-key JOIN that exercises the other cure — AQE's
runtime skew split — on a key distribution every warehouse has seen:
a default/unknown foreign key absorbing most of the fact table.

Oracle discipline (house rules): identical aliases both sides; all
emitted aggregates are integer-exact (COUNT, SUM of integral
quantities) so the cross-engine hash cannot be split by double
summation order on a deliberately gigantic hot group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..queries import register

# --- planted-hot-key join (AQE skew-split demo) -----------------------------

_HOT_KEY_ORACLE = """
    WITH fact AS (
      SELECT CASE WHEN l_orderkey % 4 <> 0 THEN -1 ELSE l_orderkey END AS hk,
             l_quantity, l_returnflag
      FROM lineitem
    ), dim AS (
      SELECT CASE WHEN o_orderkey % 4 <> 0 THEN -1 ELSE o_orderkey END AS hk,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_li,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
           CAST(SUM(n_orders) AS BIGINT) AS n_orders_sum
    FROM fact JOIN dim USING (hk)
    GROUP BY l_returnflag
    """


@register("lineitem_hot_key_join", _HOT_KEY_ORACLE)
def q_lineitem_hot_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dim join on a PLANTED hot key: 75% of lineitem rows
    collapse onto hk=-1 (a sentinel no real order key can take --
    order keys start at 0) (the "unknown/default foreign key" skew shape
    every 100 TB warehouse hits), the tail keeps its own key. The dim
    side is aggregated orders on the same mapping — unique per hk, so
    the join fans out 1:1 and only the SHUFFLE is skewed, which is
    exactly the case AQE's OptimizeSkewedJoin repairs by splitting
    the hot partition into advisory-sized slices.

    The dim carries an explicit SHUFFLE_MERGE hint: at bench scale the
    ~40k-row dim would broadcast (hiding the skew entirely — the cure
    that stops working when the dim outgrows the driver at 100 TB),
    so the query pins the sort-merge path the big-data regime uses.
    tests/test_plans.py:test_hot_key_join_aqe_skew_split executes this
    exact plan with production-shaped AQE thresholds and pins
    ``skew=true`` in the executed SortMergeJoin; the oracle is the
    plain declarative join-aggregate, so the split is proven
    result-identical.

    Emitted aggregates are integer-exact on purpose — the hot group
    sums hundreds of thousands of values, where double summation
    order could flip a rounded 4th decimal across engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    hk_l = (
        F.when(F.col("l_orderkey") % 4 != 0, F.lit(-1))
        .otherwise(F.col("l_orderkey"))
        .cast("long")
    )
    fact = li.select(
        hk_l.alias("hk"), F.col("l_quantity"), F.col("l_returnflag")
    )
    # dim = one row per hk. Built as tail-union-hot rather than
    # groupBy(hk): an aggregate pre-partitioned on the join key would
    # sit between the shuffle stage and the join, and AQE's
    # OptimizeSkewedJoin only matches a SortMergeJoin whose children
    # are PLAIN shuffle reads — the union leaves both join inputs as
    # fresh exchanges, so the hot partition is actually splittable.
    # Semantics are identical to GROUP BY hk (tail keys are already
    # unique; the hot row carries the collapsed tail's count).
    tail = orders.filter(F.col("o_orderkey") % 4 == 0).select(
        F.col("o_orderkey").alias("hk"), F.lit(1).cast("long").alias("n_orders")
    )
    hot = (
        orders.filter(F.col("o_orderkey") % 4 != 0)
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .select(F.lit(-1).cast("long").alias("hk"), "n_orders")
    )
    dim = tail.unionByName(hot)
    j = fact.join(dim.hint("shuffle_merge"), "hk")
    return j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_li"),
        F.sum("l_quantity").cast("double").alias("sum_qty"),
        F.sum("n_orders").cast("long").alias("n_orders_sum"),
    )
