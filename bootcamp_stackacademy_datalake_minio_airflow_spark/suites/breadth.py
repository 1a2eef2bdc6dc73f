"""Operator-breadth queries (SURVEY §2.2/§2.4/§2.6 categories the
reference lacks but a complete engine must provide).

The reference never filters a row, sorts, windows, or set-ops
(SURVEY §2.2 "Absent", §2.6). Spark provides all of these; each gets a
named query + DuckDB oracle so the correctness gate covers the full
relational surface, not just reference parity.

Float rule: every aggregated/derived float is ROUNDed identically on
both sides so summation order can't flip the driver's value hash.
Top-k rule: every LIMIT is preceded by a total order including a
unique key, so the k rows are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..queries import register


# --- row filters: AND/OR, IN, BETWEEN, LIKE (absent in reference §2.2) ---
@register(
    "filter_predicates",
    """
    SELECT l_orderkey AS pedido, l_linenumber AS item,
           l_quantity AS qtd, l_extendedprice AS preco
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 40
      AND l_returnflag IN ('A', 'R')
      AND (l_discount > 0.05 OR l_tax < 0.03)
      AND l_shipdate >= TIMESTAMP '1995-01-01'
    """,
)
def q_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 40)
        & F.col("l_returnflag").isin("A", "R")
        & ((F.col("l_discount") > 0.05) | (F.col("l_tax") < 0.03))
        & (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
    ).select(
        F.col("l_orderkey").alias("pedido"),
        F.col("l_linenumber").alias("item"),
        F.col("l_quantity").alias("qtd"),
        F.col("l_extendedprice").alias("preco"),
    )


@register(
    "filter_like",
    """
    SELECT p_partkey AS id_produto, p_name AS nome
    FROM part WHERE p_name LIKE '%gold%' OR p_type LIKE 'SMALL%'
    """,
)
def q_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%gold%") | F.col("p_type").like("SMALL%")).select(
        F.col("p_partkey").alias("id_produto"), F.col("p_name").alias("nome")
    )


# --- TPC-H Q1-shaped grouped aggregation: SUM/AVG/MIN/MAX/COUNT ----------
@register(
    "groupby_aggregates",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(MIN(l_extendedprice), 2) AS min_price,
           ROUND(MAX(l_extendedprice), 2) AS max_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- DISTINCT aggregation + HAVING ---------------------------------------
@register(
    "distinct_agg_having",
    """
    SELECT o_custkey AS cliente,
           COUNT(DISTINCT o_orderstatus) AS n_status,
           COUNT(*) AS n_pedidos
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) > 5
    """,
)
def q_distinct_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_custkey").alias("cliente"))
        .agg(
            F.countDistinct("o_orderstatus").alias("n_status"),
            F.count(F.lit(1)).alias("n_pedidos"),
        )
        .filter(F.col("n_pedidos") > 5)
    )


# --- ROLLUP (grouping sets family) ----------------------------------------
@register(
    "rollup_agg",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    -- empty-input parity (VERDICT r10 ask #3): Spark emits ZERO rows
    -- for grouping-sets constructs over empty input; standard SQL
    -- (DuckDB) emits the grand-total row with COUNT(*)=0. The guard
    -- is a no-op on non-empty input (every group incl. the grand
    -- total has COUNT(*)>=1) and drops exactly that row when empty.
    HAVING COUNT(*) > 0
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "cube_agg",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    HAVING COUNT(*) > 0  -- empty-input parity; see rollup_agg
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


# --- window functions: ranking + running + lag ----------------------------
@register(
    "window_rank",
    """
    SELECT * FROM (
      SELECT o_custkey AS cliente, o_orderkey AS pedido, o_totalprice AS total,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn,
             RANK() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            F.col("o_custkey").alias("cliente"),
            F.col("o_orderkey").alias("pedido"),
            F.col("o_totalprice").alias("total"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_lag",
    """
    SELECT o_custkey AS cliente, o_orderkey AS pedido,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS UNBOUNDED PRECEDING), 2) AS acumulado,
           LAG(o_orderkey) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS pedido_anterior
    FROM orders
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        F.col("o_custkey").alias("cliente"),
        F.col("o_orderkey").alias("pedido"),
        F.round(F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias(
            "acumulado"
        ),
        F.lag("o_orderkey").over(w).alias("pedido_anterior"),
    )


# --- sort + limit (top-k), deterministic via unique key -------------------
@register(
    "sort_limit_topk",
    """
    SELECT o_orderkey AS pedido, o_totalprice AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(F.col("o_orderkey").alias("pedido"), F.col("o_totalprice").alias("total"))
        .orderBy(F.desc("total"), F.asc("pedido"))
        .limit(25)
    )


# --- set operations --------------------------------------------------------
@register(
    "set_intersect_except",
    """
    WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
         b AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O')
    SELECT k, 'both' AS origem FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
    UNION ALL
    SELECT k, 'f_only' AS origem FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
    """,
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k")).distinct()
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k")).distinct()
    both = a.intersect(b).withColumn("origem", F.lit("both"))
    f_only = a.exceptAll(b).withColumn("origem", F.lit("f_only"))
    return both.unionByName(f_only)


# --- join types: inner / semi / anti / full -------------------------------
@register(
    "join_inner_agg",
    """
    SELECT n.n_name AS nacao, COUNT(*) AS n_clientes,
           ROUND(SUM(c.c_acctbal), 2) AS saldo_total
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner")
        .groupBy(F.col("n_name").alias("nacao"))
        .agg(
            F.count(F.lit(1)).alias("n_clientes"),
            F.round(F.sum("c_acctbal"), 2).alias("saldo_total"),
        )
    )


@register(
    "join_semi_anti",
    """
    SELECT c_custkey AS cliente, 'com_pedido' AS tipo FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT c_custkey AS cliente, 'sem_pedido' AS tipo FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select(F.col("c_custkey").alias("cliente"))
        .withColumn("tipo", F.lit("com_pedido"))
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(F.col("c_custkey").alias("cliente"))
        .withColumn("tipo", F.lit("sem_pedido"))
    )
    return semi.unionByName(anti)


@register(
    "join_full_outer",
    """
    SELECT COALESCE(a.k, b.k) AS k, a.n_f, b.n_o
    FROM (SELECT o_custkey AS k, COUNT(*) AS n_f FROM orders
          WHERE o_orderstatus = 'F' GROUP BY o_custkey) a
    FULL OUTER JOIN
         (SELECT o_custkey AS k, COUNT(*) AS n_o FROM orders
          WHERE o_orderstatus = 'O' GROUP BY o_custkey) b
    ON a.k = b.k
    """,
)
def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_f"))
    )
    b = (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_o"))
    )
    return a.join(b, a.k == b.k, "full_outer").select(
        F.coalesce(a.k, b.k).alias("k"), "n_f", "n_o"
    )


# --- conditionals: CASE WHEN ----------------------------------------------
@register(
    "case_when_bucketing",
    """
    SELECT o_orderkey AS pedido,
           CASE WHEN o_totalprice < 50000 THEN 'baixo'
                WHEN o_totalprice < 150000 THEN 'medio'
                ELSE 'alto' END AS faixa,
           CASE o_orderstatus WHEN 'F' THEN 'fechado'
                              WHEN 'O' THEN 'aberto'
                              ELSE 'outro' END AS situacao
    FROM orders
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("pedido"),
        F.when(F.col("o_totalprice") < 50000, "baixo")
        .when(F.col("o_totalprice") < 150000, "medio")
        .otherwise("alto")
        .alias("faixa"),
        F.when(F.col("o_orderstatus") == "F", "fechado")
        .when(F.col("o_orderstatus") == "O", "aberto")
        .otherwise("outro")
        .alias("situacao"),
    )


# --- date functions ---------------------------------------------------------
@register(
    "date_functions",
    """
    SELECT o_orderkey AS pedido,
           EXTRACT(YEAR FROM o_orderdate) AS ano,
           EXTRACT(MONTH FROM o_orderdate) AS mes,
           EXTRACT(DAY FROM o_orderdate) AS dia,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS mes_inicio,
           DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS dias_ate_fim
    FROM orders
    """,
)
def q_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("pedido"),
        F.year("o_orderdate").alias("ano"),
        F.month("o_orderdate").alias("mes"),
        F.dayofmonth("o_orderdate").alias("dia"),
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("mes_inicio"),
        F.datediff(F.lit("1998-12-01").cast("date"), F.to_date("o_orderdate")).alias(
            "dias_ate_fim"
        ),
    )


# --- string functions: concat/substr/trim/split/length/lpad -----------------
@register(
    "string_functions",
    """
    SELECT p_partkey AS id,
           CONCAT(p_brand, ':', p_type) AS marca_tipo,
           SUBSTRING(p_name, 1, 10) AS prefixo,
           LENGTH(p_name) AS tam,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS tam_pad,
           SPLIT_PART(p_type, ' ', 1) AS tipo_1
    FROM part
    """,
)
def q_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("id"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("marca_tipo"),
        F.substring("p_name", 1, 10).alias("prefixo"),
        F.length("p_name").alias("tam"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("tam_pad"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("tipo_1"),
    )


# --- math functions ----------------------------------------------------------
@register(
    "math_functions",
    """
    SELECT l_orderkey AS pedido, l_linenumber AS item,
           ROUND(ABS(l_extendedprice - l_quantity * 1000), 2) AS desvio,
           ROUND(SQRT(l_quantity), 4) AS raiz,
           CAST(CEIL(l_discount * 100) AS BIGINT) AS desc_pct,
           CAST(FLOOR(l_tax * 100) AS BIGINT) AS taxa_pct,
           MOD(l_linenumber, 3) AS resto
    FROM lineitem
    """,
)
def q_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("pedido"),
        F.col("l_linenumber").alias("item"),
        F.round(F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000), 2).alias("desvio"),
        F.round(F.sqrt("l_quantity"), 4).alias("raiz"),
        F.ceil(F.col("l_discount") * 100).alias("desc_pct"),
        F.floor(F.col("l_tax") * 100).alias("taxa_pct"),
        (F.col("l_linenumber") % 3).alias("resto"),
    )


# --- TPC-H Q3-shaped: multi-join + agg + sort + limit ------------------------
@register(
    "tpch_q3_shaped",
    """
    SELECT l.l_orderkey AS pedido,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS receita,
           CAST(o.o_orderdate AS DATE) AS data_pedido
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY receita DESC, pedido
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .filter(
            (F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp"))
            & (F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
        )
        .groupBy(
            F.col("l_orderkey").alias("pedido"),
            F.to_date("o_orderdate").alias("data_pedido"),
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "receita"
            )
        )
        .select("pedido", "receita", "data_pedido")
        .orderBy(F.desc("receita"), F.asc("pedido"))
        .limit(10)
    )
