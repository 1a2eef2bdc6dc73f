"""Reference-parity queries (SURVEY.md §2.1-§2.5).

Each query exercises one operator block from the reference over the
driver's testdata tables, paired with equivalent DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import null_fill, replace_literal, to_date_col
from ..operators.pivot import pivot_sum
from ..plans.vendas import VENDAS_TESTDATA_ORACLE, vendas_testdata
from ..queries import register


# --- flagship: pivot + 4 left joins + scalar transforms (§3.2) ----------
@register("vendas_flagship", VENDAS_TESTDATA_ORACLE)
def q_vendas(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vendas_testdata(spark, sf_dir)


# --- P1: column projection (reference :53,:65,:77,:89,:104) -------------
@register(
    "projection",
    "SELECT p_type AS categoria, p_partkey AS id_produto FROM part",
)
def q_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "part").select(
        F.col("p_type").alias("categoria"), F.col("p_partkey").alias("id_produto")
    )


# --- A1: pivot-sum standalone (reference :91-92) -------------------------
@register(
    "pivot_sum_payments",
    """
    SELECT l_orderkey AS order_id,
           ROUND(SUM(CASE WHEN l_returnflag = 'A' THEN l_extendedprice END), 2) AS A,
           ROUND(SUM(CASE WHEN l_returnflag = 'N' THEN l_extendedprice END), 2) AS N,
           ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_extendedprice END), 2) AS R
    FROM lineitem GROUP BY l_orderkey
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_returnflag").alias("payment_type"),
        F.col("l_extendedprice").alias("payment_value"),
    )
    return pivot_sum(
        li, "order_id", "payment_type", "payment_value", values=["A", "N", "R"], round_to=2
    )


# --- J1-J4: left join with null extension + F1 null-fill ------------------
@register(
    "left_join_null_fill",
    """
    SELECT l.l_orderkey AS order_id, l.l_linenumber AS item,
           l.l_extendedprice AS price,
           COALESCE(o.o_totalprice, 0) AS total_pedido,
           o.o_orderpriority AS prioridade
    FROM lineitem l
    LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F') o
      ON l.l_orderkey = o.o_orderkey
    """,
)
def q_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey, "left").select(
        li.l_orderkey.alias("order_id"),
        li.l_linenumber.alias("item"),
        li.l_extendedprice.alias("price"),
        orders.o_totalprice.alias("total_pedido"),
        orders.o_orderpriority.alias("prioridade"),
    )
    return null_fill(joined, 0.0, ["total_pedido"])


# --- F2/F3: timestamp -> date cast (reference :71-75, :123) ---------------
@register(
    "timestamp_to_date",
    """
    SELECT o_orderkey AS pedido, CAST(o_orderdate AS DATE) AS data_venda,
           o_orderdate AS ts_venda
    FROM orders
    """,
)
def q_ts_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("pedido"),
        to_date_col("o_orderdate").alias("data_venda"),
        F.col("o_orderdate").alias("ts_venda"),
    )


# --- F4/F5: upper + literal replace (reference :126-130) ------------------
@register(
    "string_normalize",
    """
    SELECT p_partkey AS id_produto,
           REPLACE(UPPER(p_type), ' ', '_') AS categoria,
           UPPER(p_brand) AS marca
    FROM part
    """,
)
def q_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("id_produto"),
        replace_literal(F.upper(F.col("p_type")), " ", "_").alias("categoria"),
        F.upper(F.col("p_brand")).alias("marca"),
    )


# --- S4: multi-source UNION ALL (reference pd.concat loop :36-59) ---------
@register(
    "union_all_sources",
    """
    SELECT c_custkey AS k, c_name AS nome FROM customer
    UNION ALL
    SELECT s_suppkey AS k, s_name AS nome FROM supplier
    """,
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), F.col("c_name").alias("nome")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k"), F.col("s_name").alias("nome")
    )
    return c.unionByName(s)
