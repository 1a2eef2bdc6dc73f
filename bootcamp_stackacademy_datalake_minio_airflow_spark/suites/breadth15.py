"""Round-10 breadth: in-engine model estimation + training-split
machinery — seeded Lloyd k-means (the oracle-replayable twin of the
MLlib quantizer behind ``ivf_index``), full-batch-GD logistic
regression (the twin of the MLlib classifier in
``operators/classifier.py``), a Poisson-bootstrap CI (the one-pass
resampling scheme that scales — Chamandy et al. 2012), group-aware
k-fold assignment, and next-token training-example construction.

The reference has none of these (SURVEY §2 marks every analytics /
ML category absent) — they are part of the mandated
training-data-pipeline extension surface.

Oracle discipline (house rules): seeded state via (md5, id)
ordering; every cross-engine float argmin/argsort keys on
ROUND(x, 4) with an id tie-break; iterated state (centroids,
weights) is ROUNDed between steps so both engines enter step t+1
bit-identical; checksums and counts are integer-exact end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..queries import register
from .extensions import _hex_fold

_NORM_SQL = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"

# --- seeded Lloyd k-means over embeddings ------------------------------------


def _kmeans_assign_sql(src_c: str) -> str:
    """Assignment CTE body: nearest centroid from ``src_c`` by
    ROUND(v·v − 2·v·c + c·c, 4) with centroid-id tie-break."""
    d2 = (
        "ROUND(list_inner_product(e.v, e.v)"
        " - 2 * list_inner_product(e.v, c.cv)"
        " + list_inner_product(c.cv, c.cv), 4)"
    )
    return f"""
      SELECT vec_id, v, cid, d2r FROM (
        SELECT e.vec_id, e.v, c.cid, {d2} AS d2r,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id ORDER BY {d2}, c.cid) AS rn
        FROM e CROSS JOIN {src_c} c
      ) WHERE rn = 1"""


def _kmeans_oracle(k: int = 8, n_iter: int = 2, dim: int = 64) -> str:
    parts = [
        f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) = {dim}
    ), seeds AS (
      SELECT v AS cv,
             ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
               - 1 AS cid
      FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k}
    ), a0 AS ({_kmeans_assign_sql('seeds')})"""
    ]
    for t in range(n_iter):
        parts.append(f"""
    , m{t} AS (
      SELECT cid, i, ROUND(AVG(v[i]), 6) AS m
      FROM (SELECT cid, v, unnest(range(1, {dim + 1})) AS i FROM a{t})
      GROUP BY cid, i
    ), c{t + 1} AS (
      SELECT cid, list(m ORDER BY i) AS cv FROM m{t} GROUP BY cid
    ), a{t + 1} AS ({_kmeans_assign_sql(f'c{t + 1}')})""")
    parts.append(f"""
    SELECT cid AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND(SUM(d2r), 2) AS inertia
    FROM a{n_iter} GROUP BY cid""")
    return "".join(parts)


@register("kmeans_embedding_clusters", _kmeans_oracle())
def q_kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Lloyd k-means (operators/clustering.py): 2 iterations
    from the 8 md5-smallest seed vectors, per-cluster sizes +
    inertia. The oracle replays the ENTIRE descent — seed selection,
    both rounded-argmin assignments, the ROUND(avg, 6) centroid
    updates — so a single flipped assignment anywhere hash-fails.
    The MLlib KMeans path (similarity.ivf_index) stays pytest-covered;
    this is its deterministic twin, the same pattern as
    embedding_ivf_recall. Each iteration is one k×dim partial-mean
    aggregate; centroids ride as literals (never a join)."""
    from ..operators.clustering import kmeans_lloyd_seeded

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_lloyd_seeded(emb, "vec_id", "embedding", k=8, n_iter=2)


# --- full-batch-GD logistic regression (quality classifier twin) -------------

_LR = 0.5
_GD_STEPS = 3

_PUNCT_SQL = (
    "ROUND(length(regexp_replace(text, '[^.,;:!?''\"()\\[\\]{}-]', '', 'g'))"
    " * 1.0 / length(text), 4)"
)


def _logreg_oracle(lr: float = _LR, n_steps: int = _GD_STEPS) -> str:
    parts = [
        f"""
    WITH base AS (
      SELECT string_split({_NORM_SQL}, ' ') AS ts, lang, text
      FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
    ), feat AS (
      SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
             LEAST(len(ts) / 100.0, 3.0) AS x1,
             ROUND(len(list_filter(ts,
                     t -> t IN ('the','and','of','to','in','is','a')))
                   * 1.0 / len(ts), 4) AS x2,
             {_PUNCT_SQL} AS x3
      FROM base
    ), w0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)"""
    ]
    for s in range(1, n_steps + 1):
        parts.append(f"""
    , s{s} AS (
      SELECT y, x1, x2, x3,
             1.0 / (1.0 + exp(-(w.b + w.w1 * x1 + w.w2 * x2 + w.w3 * x3)))
               AS p
      FROM feat CROSS JOIN w{s - 1} w
    ), g{s} AS (
      SELECT SUM(p - y) / COUNT(*) AS gb,
             SUM((p - y) * x1) / COUNT(*) AS g1,
             SUM((p - y) * x2) / COUNT(*) AS g2,
             SUM((p - y) * x3) / COUNT(*) AS g3
      FROM s{s}
    ), w{s} AS (
      SELECT ROUND(w.b - {lr} * g.gb, 6) AS b,
             ROUND(w.w1 - {lr} * g.g1, 6) AS w1,
             ROUND(w.w2 - {lr} * g.g2, 6) AS w2,
             ROUND(w.w3 - {lr} * g.g3, 6) AS w3
      FROM w{s - 1} w CROSS JOIN g{s} g
    )""")
    parts.append(f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           w.b AS w_bias, w.w1 AS w_len, w.w2 AS w_stop, w.w3 AS w_punct,
           ROUND(SUM(CASE WHEN ((w.b + w.w1 * x1 + w.w2 * x2 + w.w3 * x3)
                                >= 0) = (y = 1.0)
                          THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4) AS accuracy
    FROM feat CROSS JOIN w{n_steps} w
    GROUP BY w.b, w.w1, w.w2, w.w3""")
    return "".join(parts)


@register("quality_logreg_gd", _logreg_oracle())
def q_quality_logreg_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-batch-GD logistic regression trained IN the engine
    (operators/classifier.py:logreg_gd_train): is-English from three
    exact-provenance features (capped token count / en-stopword ratio
    / punctuation ratio — all integer ratios ROUNDed at construction,
    so both engines see bit-identical x). 3 steps, lr=0.5, weights
    ROUND(·, 6) between steps (half-away, the SQL convention). The
    oracle replays every gradient: each step is one map-side-
    combinable SUM per feature, the driver sees one scalar row per
    step — the MLlib L-BFGS path (train_embedding_classifier) stays
    pytest-covered; this is its hash-gated twin."""
    from ..operators.classifier import logreg_gd_train
    from ..operators.text import STOPWORDS, punct_ratio, tokens

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(
        F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
    ).select("lang", "text", tokens("text").alias("__ts"))
    nt = F.size("__ts")
    stop = F.size(F.filter("__ts", lambda t: t.isin(*STOPWORDS["en"])))
    feat = base.select(
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        F.least(nt / 100.0, F.lit(3.0)).alias("len"),
        F.round(stop * 1.0 / nt, 4).alias("stop"),
        punct_ratio("text").alias("punct"),
    )
    return logreg_gd_train(
        feat, "y", ["len", "stop", "punct"], lr=_LR, n_steps=_GD_STEPS
    )


# --- Poisson-bootstrap CI -----------------------------------------------------

_BOOT_REPS = 100
_BOOT_ALPHA = 0.05


def _bootstrap_oracle(n_reps: int = _BOOT_REPS, alpha: float = _BOOT_ALPHA) -> str:
    import math

    from ..operators.sampling import _hex_threshold

    pmf, cum, cdf = math.exp(-1.0), 0.0, []
    for j in range(5):
        cum += pmf
        cdf.append(_hex_threshold(min(cum, 1.0)))
        pmf /= j + 1
    cases = " ".join(
        f"WHEN d < '{cdf[j]}' THEN {j}" for j in range(5)
    )
    lo_off = math.ceil(alpha / 2.0 * n_reps) - 1
    hi_off = math.ceil((1.0 - alpha / 2.0) * n_reps) - 1
    return f"""
    WITH vals AS (
      SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS v FROM orders
      WHERE o_totalprice IS NOT NULL
    ), reps AS (SELECT unnest(range(1, {n_reps + 1})) AS rep),
    draws AS (
      SELECT rep, v,
             substr(md5('boot:' || CAST(rep AS VARCHAR) || ':'
                        || CAST(k AS VARCHAR)), 1, 8) AS d
      FROM vals CROSS JOIN reps
    ), wt AS (
      SELECT rep, v, CASE {cases} ELSE 5 END AS w FROM draws
    ), means AS (
      SELECT rep, ROUND(SUM(w * v) / SUM(w), 4) AS m
      FROM wt GROUP BY rep HAVING SUM(w) > 0
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM means) AS n_reps,
           (SELECT ROUND(AVG(v), 4) FROM vals) AS mean,
           (SELECT m FROM means ORDER BY m, rep LIMIT 1 OFFSET {lo_off})
             AS ci_lo,
           (SELECT m FROM means ORDER BY m, rep LIMIT 1 OFFSET {hi_off})
             AS ci_hi
    """


@register("bootstrap_ci_order_value", _bootstrap_oracle())
def q_bootstrap_ci_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Poisson-bootstrap CI for mean order value
    (operators/analytics.py:poisson_bootstrap_mean_ci): each order
    draws a deterministic Poisson(1) weight per replicate from md5
    CDF thresholds, replicate means are ROUND(·, 4), bounds are the
    3rd/98th order statistics with rep tie-break. One map-side
    explode + one partial-aggregable groupBy(rep) — resamples are
    never materialized, the shuffle carries B rows per partition, the
    driver sees exactly B replicate means. The oracle replays every
    draw, weight, and both order statistics."""
    from ..operators.analytics import poisson_bootstrap_mean_ci

    orders = load_table(spark, sf_dir, "orders")
    return poisson_bootstrap_mean_ci(
        orders, "o_orderkey", "o_totalprice",
        n_reps=_BOOT_REPS, alpha=_BOOT_ALPHA,
    )


# --- next-token training-example construction ---------------------------------

_LM_EXAMPLES_ORACLE = rf"""
    WITH base AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS ts
      FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
    ), ex AS (
      SELECT doc_id, ts[i - 2] || ' ' || ts[i - 1] AS context,
             ts[i] AS target
      FROM (
        SELECT doc_id, ts, unnest(range(3, len(ts) + 1)) AS i
        FROM base WHERE len(ts) >= 3
      )
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_examples,
           CAST(COUNT(DISTINCT context) AS BIGINT) AS n_unique_contexts,
           CAST(SUM({_hex_fold("md5(context || '>' || target)")}) AS BIGINT)
             AS example_checksum
    FROM ex GROUP BY doc_id
    """


@register("lm_training_examples", _LM_EXAMPLES_ORACLE)
def q_lm_training_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autoregressive training-example construction
    (operators/text.py:next_token_examples): per doc, the
    (2-token context, next token) pairs with an order-insensitive
    integer checksum (sum of 8-hex md5 folds), so the gate pins the
    EXACT example set — a wrong window offset or off-by-one stride
    changes the checksum. Map-side explode over an in-row sequence;
    the token array never leaves its row."""
    from ..operators.text import next_token_examples

    docs = load_table(spark, sf_dir, "documents")
    return next_token_examples(docs, "doc_id", "text", ctx_len=2)


# --- group-aware k-fold cross-validation assignment ---------------------------


def _kfold_oracle(k: int = 5) -> str:
    fold = _hex_fold("md5('cv:' || CAST(o_custkey AS VARCHAR))")
    return f"""
    SELECT fold, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_groups,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM (
      SELECT o_custkey, o_totalprice,
             CAST({fold} % {k} AS INT) AS fold
      FROM orders
    ) GROUP BY fold
    """


@register("crossval_fold_assignment", _kfold_oracle())
def q_crossval_fold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware 5-fold CV assignment
    (operators/sampling.py:kfold_group_assign): fold = md5-fold of
    the CUSTOMER key mod 5, so all of a customer's orders share a
    fold — the k-fold analogue of split_leakage_safe's guarantee
    (leakage is zero by construction, not by audit). Pure map-side
    column + one partial-aggregable per-fold rollup."""
    from ..operators.sampling import kfold_group_assign

    orders = load_table(spark, sf_dir, "orders")
    return (
        kfold_group_assign(orders, "o_custkey", k=5, salt="cv")
        .groupBy("fold")
        .agg(
            F.countDistinct("o_custkey").cast("long").alias("n_groups"),
            F.count("*").cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )
