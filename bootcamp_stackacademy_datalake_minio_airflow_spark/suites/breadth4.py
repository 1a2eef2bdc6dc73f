"""Round-2 breadth: deterministic sampling/splits/quotas, web-corpus
cleaning, vocabulary stats, batch ANN, and more TPC-H shapes
(Q10/Q13/Q15/Q16/Q22 adapted to the testdata schema — the synthetic
tables lack comment/phone/shipmode columns, so the shapes keep the
join/agg/subquery structure and substitute available columns).

Sampling oracles are exact by construction: membership is a pure
function of md5(key), which DuckDB computes byte-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.sampling import (
    mixture_sample,
    _hex_threshold,
    hash_sample,
    hash_split,
    stratified_quota,
)
from ..operators.similarity import cosine
from ..operators.text import (
    clean_text,
    email_count,
    length_histogram,
    top_tokens,
    url_count,
)
from ..queries import register

# --- deterministic sampling --------------------------------------------------

_T25 = _hex_threshold(0.25)


@register(
    "sample_hash_documents",
    f"""
    SELECT doc_id, source
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{_T25}'
    """,
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", 0.25).select("doc_id", "source")


_T80 = _hex_threshold(0.8)
_T90 = _hex_threshold(0.9)


@register(
    "sample_split_counts",
    f"""
    SELECT source, split, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM (
      SELECT source,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{_T80}' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{_T90}' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    GROUP BY source, split
    """,
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    split = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    return split.groupBy("source", "split").agg(F.count(F.lit(1)).alias("n_docs"))


@register(
    "sample_stratified_quota",
    """
    SELECT doc_id, source
    FROM documents
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY source
      ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
    ) <= 40
    """,
)
def q_stratified_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return stratified_quota(docs, "source", "doc_id", 40).select("doc_id", "source")


_TMIX_FULL = _hex_threshold(1.0)
_TMIX_HALF = _hex_threshold(0.5)
_TMIX_TENTH = _hex_threshold(0.1)
_TMIX_DEF = _hex_threshold(0.3)


@register(
    "sample_source_mixture",
    f"""
    SELECT doc_id, source
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
          CASE source WHEN 'src0' THEN '{_TMIX_FULL}'
                      WHEN 'src1' THEN '{_TMIX_HALF}'
                      WHEN 'src2' THEN '{_TMIX_TENTH}'
                      ELSE '{_TMIX_DEF}' END
    """,
)
def q_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture weighting (operators/sampling.py:mixture_sample): keep
    all of src0, half of src1, a tenth of src2, 30% of everything
    else — one map-side CASE + md5 draw, per-key stable."""
    docs = load_table(spark, sf_dir, "documents")
    return mixture_sample(
        docs, "source", "doc_id",
        rates={"src0": 1.0, "src1": 0.5, "src2": 0.1},
        default_rate=0.3,
    ).select("doc_id", "source")


# --- web-corpus cleaning (HTML/URL strip, PII redaction) ---------------------


@register(
    "text_clean_stats",
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, 'https?://\S+')) AS BIGINT) AS n_urls,
           CAST(len(regexp_extract_all(
                 text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+')) AS BIGINT)
             AS n_emails,
           CAST(length(trim(regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(text, '<[^>]+>', ' ', 'g'),
                     'https?://\S+', ' ', 'g'),
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
                 '\s+', ' ', 'g'))) AS BIGINT) AS clean_len
    FROM documents
    """,
)
def q_text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        url_count("text").cast("long").alias("n_urls"),
        email_count("text").cast("long").alias("n_emails"),
        F.length(clean_text("text")).cast("long").alias("clean_len"),
    )


# --- vocabulary / corpus statistics ------------------------------------------


@register(
    "corpus_top_tokens",
    r"""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT unnest(string_split(
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS token
      FROM documents
    )
    WHERE length(token) > 0
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 50
    """,
)
def q_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return top_tokens(docs, "text", k=50).select("token", F.col("n").cast("long"))


@register(
    "doc_length_histogram",
    """
    SELECT CAST(floor(length(text) / 100) * 100 AS BIGINT) AS len_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY 1
    """,
)
def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return length_histogram(docs, "text", bucket_width=100)


# --- batch ANN: top-k neighbors for a set of query vectors -------------------


@register(
    "ann_batch_topk",
    """
    SELECT q_id, vec_id, cos_sim
    FROM (
      SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
             ROUND(list_cosine_similarity(c.embedding::DOUBLE[],
                                          q.embedding::DOUBLE[]), 4) AS cos_sim
      FROM embeddings c, embeddings q
      WHERE q.vec_id < 5 AND c.vec_id >= 5
    )
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY q_id ORDER BY cos_sim DESC, vec_id
    ) <= 3
    """,
)
def q_ann_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 exact neighbors for each of 5 query vectors in ONE job:
    broadcast the (tiny) query set against the corpus, score JVM-side,
    rank per query. At scale the corpus never shuffles — the broadcast
    join is map-side and the per-query rank shuffles only corpus x
    n_queries scored rows, which an LSH/IVF pre-filter would first cut
    by orders of magnitude (see ann_topk_lsh / ivf_topk).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        "q_id",
        "vec_id",
        F.round(
            cosine(
                F.col("embedding").cast("array<double>"),
                F.col("q_emb").cast("array<double>"),
            ),
            4,
        ).alias("cos_sim"),
    )
    # salted tournament (sampling.bottom_k_per_group): each q_id's
    # window partition would otherwise hold the WHOLE scored corpus —
    # five tasks ranking billions at 100 TB, unsplittable by AQE
    from ..operators.sampling import bottom_k_per_group

    return bottom_k_per_group(
        scored,
        ["q_id"],
        [F.desc("cos_sim"), F.asc("vec_id")],
        3,
        F.pmod(F.xxhash64(F.col("vec_id")), F.lit(64)),
    )


# --- TPC-H shapes ------------------------------------------------------------


@register(
    "tpch_q10_shaped",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: returned-item revenue ranking. Fact join shuffles on
    the order key; customer/nation broadcast; top-20 compiles to
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1996-07-01")
            ),
            li.l_orderkey == o.o_orderkey,
        )
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q13_shaped",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                         AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape (customer order-count distribution): left join keeps
    zero-order customers; two hash aggregations, the second tiny."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q15_shaped",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape (top supplier by quarterly revenue): the revenue CTE
    is computed once and reused for both the join and the MAX — in
    Spark, AQE reuses the exchange rather than rescanning lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_revenue"
            )
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        s.join(F.broadcast(revenue), s.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q16_shaped",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 4, 7)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: supplier diversity per part group with a NOT IN
    exclusion (anti-join against a broadcast-sized bad-supplier list;
    lineitem stands in for partsupp, which the testdata lacks)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(
            F.broadcast(
                p.filter(
                    (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 4, 7)
                )
            ),
            li.l_partkey == p.p_partkey,
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q22_shaped",
    """
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0
      )
      AND c_custkey NOT IN (
        SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-07-01'
      )
    GROUP BY c_mktsegment
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape (wealthy lapsed customers): scalar subquery for the
    positive-balance mean, anti-join against recent orders, segment rollup
    (mktsegment stands in for the phone country code)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("a"))
    return (
        c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("a"))
        .join(
            o.filter(F.col("o_orderdate") >= "2000-07-01"),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# --- end-to-end curation pipeline (quality -> dedup -> quota -> split) -------

#: quality_score as SQL (shared with text_quality_score's oracle — the
#: formula is the spec, COVERAGE.md §2.5)
_QUALITY_EXPR = r"""
round(0.4 * (CASE WHEN length(text) BETWEEN 50 AND 10000 THEN 1.0 ELSE 0.0 END)
    + 0.3 * least(CASE WHEN tok > 0 THEN stops * 1.0 / tok ELSE 0.0 END, 0.3) / 0.3
    + 0.3 * (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.0 END), 4)
"""


@register(
    "curation_pipeline",
    rf"""
    WITH base AS (
      SELECT *,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split(
                         regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
             END AS tok,
             len(list_filter(
                   string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
                   x -> x IN ('the','and','of','to','in','is','a'))) AS stops,
             CASE WHEN length(text) > 0
                  THEN round(length(regexp_replace(text, '[^.,;:!?''"()\[\]{{}}-]', '', 'g'))
                             * 1.0 / length(text), 4)
                  ELSE 0.0 END AS pr
      FROM documents
    ), scored AS (
      SELECT doc_id, text, source, {_QUALITY_EXPR} AS quality FROM base
    ), kept AS (
      SELECT * FROM scored WHERE quality >= 0.5
    ), deduped AS (
      SELECT doc_id, source, quality FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn FROM kept
      ) WHERE rn = 1
    ), quota AS (
      SELECT doc_id, source, quality FROM deduped
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY source
        ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
      ) <= 40
    )
    SELECT doc_id, source, quality,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{_T80}' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{_T90}' THEN 'val'
                ELSE 'test' END AS split
    FROM quota
    """,
)
def q_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical pretraining-data flow as ONE deterministic,
    externally-auditable job: quality filter -> exact dedup ->
    per-source quota -> split labels (jobs/curate.py)."""
    from ..jobs.curate import curate

    docs = load_table(spark, sf_dir, "documents")
    out = curate(
        docs,
        min_quality=0.5,
        quota_per_source=40,
        split_weights={"train": 0.8, "val": 0.1, "test": 0.1},
    )
    return out.select("doc_id", "source", "quality", "split")


# --- event analytics shapes ---------------------------------------------------


@register(
    "latest_event_per_user",
    """
    SELECT user_id, ts, event_type
    FROM events
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC
    ) = 1
    """,
)
def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style latest-record-per-key dedup — the upsert-compaction
    read path. A max_by AGGREGATE (lexicographic max of (ts,
    event_id)), not a rank window: the aggregate partial-combines
    map-side, so a bot key with a billion events collapses per mapper
    where a window partition would funnel it through one unsplittable
    task (the r6 window-skew audit's lens)."""
    ev = load_table(spark, sf_dir, "events")
    best = F.max_by(
        F.struct("ts", "event_type"), F.struct("ts", "event_id")
    ).alias("__b")
    return (
        ev.groupBy("user_id")
        .agg(best)
        .select("user_id", F.col("__b.ts").alias("ts"), F.col("__b.event_type").alias("event_type"))
    )


@register(
    "funnel_conversion",
    """
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events
      GROUP BY user_id
    )
    SELECT CAST(COUNT(t_view) AS BIGINT) AS n_view,
           CAST(COUNT(CASE WHEN t_click > t_view THEN 1 END) AS BIGINT) AS n_click_after_view,
           CAST(COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END) AS BIGINT)
             AS n_full_funnel
    FROM firsts
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase funnel: conditional-min pivot per user
    (single shuffle), then one global conditional count — no joins, no
    window; the standard scalable funnel formulation."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    return firsts.agg(
        F.count("t_view").alias("n_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias("n_click_after_view"),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            )
        ).alias("n_full_funnel"),
    )


@register(
    "retention_cohorts",
    """
    WITH first_seen AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events
      GROUP BY user_id
    )
    SELECT f.cohort_week,
           CAST(floor(date_diff('day', f.cohort_week,
                                CAST(date_trunc('week', e.ts) AS DATE)) / 7)
             AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: first-seen week per user (one shuffle),
    re-join to events (user_id-keyed — AQE picks broadcast when the
    user dim is small), distinct actives per (cohort, offset)."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    return (
        ev.join(first_seen, "user_id")
        .select(
            "cohort_week",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7
            )
            .cast("long")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("active_users"))
    )
