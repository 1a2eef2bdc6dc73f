"""Second breadth wave: JSON functions, statistical aggregates,
percentiles, TPC-H Q5-shaped multi-dim join, embedding near-dup with a
full SQL oracle, end-to-end minhash dedup, and batch sessionization
(gaps-and-islands — the batch twin of the stateful streaming op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.dedup import dedup_minhash
from ..operators.similarity import cosine_all_pairs_blocked
from ..queries import register

# --- JSON extraction (events.props) ----------------------------------------


@register(
    "json_extract_events",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
    FROM events
    """,
)
def q_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_num"),
    )


# --- statistical aggregates --------------------------------------------------


@register(
    "stats_aggregates",
    """
    SELECT l_returnflag,
           ROUND(stddev_samp(l_extendedprice), 2) AS sd_price,
           ROUND(var_samp(l_quantity), 2) AS var_qty,
           ROUND(corr(l_extendedprice, l_quantity), 4) AS corr_pq,
           ROUND(covar_samp(l_extendedprice, l_quantity), 2) AS cov_pq
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 2).alias("var_qty"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("corr_pq"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias("cov_pq"),
    )


@register(
    "percentile_agg",
    """
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 2) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90,
           ROUND(quantile_cont(o_totalprice, 0.99), 2) AS p99
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 2).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 2).alias("p99"),
    )


# --- TPC-H Q5-shaped: 5-way dimensional join --------------------------------


@register(
    "tpch_q5_shaped",
    """
    SELECT n.n_name AS nacao,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS receita
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nacao"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "receita"
            )
        )
    )


# --- embedding cosine near-dup pairs (full SQL oracle) ----------------------


@register(
    "dedup_embedding_cosine_pairs",
    """
    SELECT id_a, id_b, cos_sim FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                          b.embedding::DOUBLE[]), 4) AS cos_sim
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ) WHERE cos_sim >= 0.35
    """,
)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the blocked distributed matmul — no driver collect at any scale
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_all_pairs_blocked(emb, threshold=0.35)


# --- end-to-end minhash dedup (documents after victim removal) ---------------


@register(
    "dedup_minhash_documents",
    # LSH banding + exact-Jaccard verification has no false positives and
    # ~1 recall at J>=0.8 (testdata pairs sit at J>=0.92), so the exact
    # brute-force shingle-Jaccard graph IS the oracle: victims are the
    # larger id of every verified pair, same as dedup_minhash's default.
    """
    WITH norm AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                          ' ') AS w
      FROM documents
    ), sh AS (
      -- word 5-grams, the Spark side's shingle unit (_word_shingles_of)
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(w)-4, 1)+1),
                                          i -> array_to_string(w[i:i+4], ' ')))
               AS s
      FROM norm
    ), ex AS (
      SELECT doc_id, unnest(s) AS g FROM sh
    ), sizes AS (
      SELECT doc_id, len(s) AS n FROM sh
    ), inter AS (
      -- |A∩B| via explode + equi-join on the shingle (~20x cheaper than
      -- per-pair list_intersect over the O(n^2) cross join, same result)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), victims AS (
      SELECT DISTINCT id_b AS victim
      FROM inter
      JOIN sizes na ON na.doc_id = id_a
      JOIN sizes nb ON nb.doc_id = id_b
      WHERE ROUND(CAST(i AS DOUBLE) / (na.n + nb.n - i), 4) >= 0.8
    )
    SELECT d.* FROM documents d
    WHERE d.doc_id NOT IN (SELECT victim FROM victims)
    """,
)
def q_dedup_minhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup_minhash(docs, "doc_id", "text", threshold=0.8)


# --- sessionization (gaps-and-islands; batch twin of stateful streaming) ----

SESSION_GAP_MIN = 30


@register(
    "user_sessionization",
    f"""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL {SESSION_GAP_MIN} MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT user_id, ts,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM marked
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM numbered GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic gaps-and-islands sessionization: a new session starts
    after a >30min silence. The streaming twin keeps the same gap
    semantics with applyInPandasWithState (streaming/sessions.py)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond precision: casting ts to long would truncate to
    # seconds and disagree with the oracle's interval comparison on
    # gaps within 1s of the boundary. unix_micros only accepts
    # TIMESTAMP (not TIMESTAMP_NTZ, which parquet readers may infer);
    # the cast is a no-op for TIMESTAMP and value-preserving for NTZ
    # because the session timezone is pinned to UTC.
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    marked = ev.withColumn(
        "new_session",
        F.when(
            micros - F.lag(micros).over(w)
            > SESSION_GAP_MIN * 60 * 1_000_000,
            1,
        )
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0),
    )
    numbered = marked.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# --- TPC-H Q6-shaped: pure scan-side predicate aggregation -------------------


@register(
    "tpch_q6_shaped",
    """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS receita_desconto,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01'
      AND l_shipdate < TIMESTAMP '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "receita_desconto"
        ),
        F.count(F.lit(1)).alias("n"),
    )


# --- TPC-H Q17-shaped: correlated scalar subquery (decorrelated by Catalyst) --


@register(
    "tpch_q17_shaped",
    """
    SELECT l.l_partkey AS produto,
           ROUND(SUM(l.l_extendedprice), 2) AS receita_baixo_volume
    FROM lineitem l
    WHERE l.l_quantity < (
      SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey
    )
    GROUP BY l.l_partkey
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__li_q17")
    # expressed in SQL so Catalyst's subquery decorrelation handles the
    # correlated scalar subquery (rewritten to an aggregate + join)
    return spark.sql(
        """
        SELECT l.l_partkey AS produto,
               ROUND(SUM(l.l_extendedprice), 2) AS receita_baixo_volume
        FROM __li_q17 l
        WHERE l.l_quantity < (
          SELECT 0.5 * AVG(l2.l_quantity) FROM __li_q17 l2
          WHERE l2.l_partkey = l.l_partkey
        )
        GROUP BY l.l_partkey
        """
    )
