"""Third breadth wave: as-of join, range join, array aggregation —
temporal and collection operators with full SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.temporal import asof_join, range_join
from ..queries import register

# --- as-of join: each event -> the user's latest order at/before it ----------


@register(
    "asof_join_events_orders",
    """
    SELECT e.event_id, e.user_id, e.ts,
           o.o_orderkey AS last_order, o.o_totalprice AS last_order_total
    FROM events e
    LEFT JOIN LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
      ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1
    ) o ON TRUE
    """,
)
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of semantics vs the oracle's LATERAL top-1: ties on
    o_orderdate resolve to the row that sorts last in the union-merge
    (largest o_orderkey — matched by the oracle's ORDER BY)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        "o_orderdate",
        "o_orderkey",
        "o_totalprice",
    )
    # ties on o_orderdate resolve inside asof_join's window order
    # (max value tuple, i.e. max o_orderkey) — matching the oracle
    out = asof_join(
        ev,
        orders,
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        value_cols=["o_orderkey", "o_totalprice"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("o_orderkey").alias("last_order"),
        F.col("o_totalprice").alias("last_order_total"),
    )


# --- range join: order totals -> price bands ---------------------------------


@register(
    "range_join_price_bands",
    """
    WITH bands(band, lo, hi) AS (
      VALUES ('low', 0.0, 100000.0),
             ('mid', 100000.0, 300000.0),
             ('high', 300000.0, 1e18)
    )
    SELECT o.o_orderkey AS pedido, b.band,
           o.o_totalprice AS total
    FROM orders o JOIN bands b
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("low", 0.0, 100000.0), ("mid", 100000.0, 300000.0), ("high", 300000.0, 1e18)],
        "band string, lo double, hi double",
    )
    out = range_join(orders, bands, "o_totalprice", "lo", "hi")
    return out.select(
        F.col("o_orderkey").alias("pedido"), "band", F.col("o_totalprice").alias("total")
    )


# --- array aggregation: sorted collect per group ------------------------------


@register(
    "array_collect_orders",
    """
    SELECT o_custkey AS cliente,
           array_to_string(list_sort(array_agg(o_orderkey)), ',') AS pedidos,
           len(array_agg(o_orderkey)) AS n
    FROM orders GROUP BY o_custkey
    """,
)
def q_array_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the sorted array is projected to a CSV string: the driver's value-hash
    # canonicalizer sorts rows and cannot hash a raw list column
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_custkey").alias("cliente")).agg(
        F.concat_ws(",", F.sort_array(F.collect_list("o_orderkey"))).alias("pedidos"),
        F.count(F.lit(1)).alias("n"),
    )


# --- explode / unnest round-trip ---------------------------------------------


@register(
    "explode_unnest",
    """
    WITH per_cust AS (
      SELECT o_custkey AS cliente, list_sort(array_agg(o_orderkey)) AS pedidos
      FROM orders GROUP BY o_custkey
    )
    SELECT cliente, unnest(pedidos) AS pedido FROM per_cust
    """,
)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("cliente")).agg(
        F.sort_array(F.collect_list("o_orderkey")).alias("pedidos")
    )
    return per_cust.select("cliente", F.explode("pedidos").alias("pedido"))


# --- GROUPING SETS (explicit set list, beyond rollup/cube) -------------------


@register(
    "grouping_sets_agg",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_extendedprice), 2) AS receita, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    HAVING COUNT(*) > 0  -- empty-input parity; see breadth.py rollup_agg
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_extendedprice), 2) AS receita, COUNT(*) AS n
        FROM __li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# --- TPC-H Q18-shaped: IN-subquery over a HAVING aggregate -------------------


@register(
    "tpch_q18_shaped",
    """
    SELECT c.c_name AS cliente, o.o_orderkey AS pedido,
           ROUND(SUM(l.l_quantity), 2) AS qtd_total
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 150
    )
    GROUP BY c.c_name, o.o_orderkey
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The HAVING aggregate already IS the output quantity: each order
    # has exactly one customer, so the re-aggregation over the
    # (order x lineitem) join the SQL spells out equals the per-order
    # sum computed for the filter. Reusing it turns the plan from
    # agg + semi-join + second lineitem shuffle-join + re-agg into ONE
    # lineitem aggregation and two order-key joins on the (filtered,
    # AQE-broadcastable) survivor set — the second-largest shuffle in
    # the query gone. l_quantity is integral, so summation-order drift
    # cannot reach ROUND(..., 2).
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 150)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.col("c_name").alias("cliente"),
            F.col("o_orderkey").alias("pedido"),
            F.round(F.col("__q"), 2).alias("qtd_total"),
        )
    )


# --- data quality: referential integrity + null profile ----------------------


@register(
    "dq_orphan_lineitems",
    """
    SELECT l.l_orderkey AS pedido, COUNT(*) AS n_orfas
    FROM lineitem l
    WHERE l.l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    GROUP BY l.l_orderkey
    """,
)
def q_dq_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.quality import orphans

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        orphans(li, o, "l_orderkey", "o_orderkey")
        .groupBy(F.col("l_orderkey").alias("pedido"))
        .agg(F.count(F.lit(1)).alias("n_orfas"))
    )


@register(
    "dq_null_profile_orders",
    """
    SELECT CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_orderkey,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_custkey,
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_orderstatus,
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_totalprice,
           CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_orderdate,
           CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_orderpriority
    FROM orders
    """,
)
def q_dq_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.quality import null_profile

    return null_profile(load_table(spark, sf_dir, "orders"))


# --- TPC-H Q2-shaped: correlated MIN subquery --------------------------------


@register(
    "tpch_q2_shaped",
    """
    SELECT p.p_partkey AS produto, p.p_retailprice AS preco
    FROM part p
    WHERE p.p_retailprice = (
      SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
    )
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    p.createOrReplaceTempView("__part_q2")
    return spark.sql(
        """
        SELECT p.p_partkey AS produto, p.p_retailprice AS preco
        FROM __part_q2 p
        WHERE p.p_retailprice = (
          SELECT MIN(p2.p_retailprice) FROM __part_q2 p2 WHERE p2.p_brand = p.p_brand
        )
        """
    )


# --- TPC-H Q14-shaped: conditional share of an aggregate ---------------------


@register(
    "tpch_q14_shaped",
    """
    SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_share
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-09-01'
      AND l.l_shipdate < TIMESTAMP '1995-10-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
        )
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_share")
        )
    )


# --- TPC-H Q19-shaped: disjunctive multi-predicate join ----------------------


@register(
    "tpch_q19_shaped",
    """
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS receita,
           COUNT(*) AS n
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 21)
    )
    cond2 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(20, 40)
    )
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .filter(cond1 | cond2)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "receita"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )
