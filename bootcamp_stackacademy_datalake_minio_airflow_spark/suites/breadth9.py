r"""Round-5 breadth: training-pipeline operator families — mixture
math (temperature-scaled source weights), deterministic epoch
shuffling, blocklist filtering audit, incremental corpus dedup,
embedding int8 quantization + Johnson–Lindenstrauss projection,
tf-idf source summaries, funnel conversion, and hour-of-day seasonal
baselines.

Oracle discipline (house rules): identical aliases both sides; ROUND
on derived floats with multiply-then-single-divide ordering; + 0.0
negative-zero normalization where rounded values can land in
(-5e-5, 0]; CAST(... AS BIGINT) on integer aggregates; second-level
epoch comparisons for cross-engine timestamp ties; integer-valued
double sums (quantized codes) are exact in IEEE so order-free.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..queries import register

# --- training mixture math ---------------------------------------------------


@register(
    "mixture_temperature_weights",
    """
    WITH c AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ), s AS (
      SELECT source, n_docs, pow(CAST(n_docs AS DOUBLE), 0.5) AS sc FROM c
    ), z AS (SELECT SUM(sc) AS z FROM s)
    SELECT source, n_docs, ROUND(sc / z.z, 6) AS weight
    FROM s CROSS JOIN z
    """,
)
def q_mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled training-mix weights per source, alpha=0.5
    (operators/sampling.py:mixture_temperature_rates) — n^alpha
    normalized; the multilingual-sampling recipe. One count agg plus a
    broadcast scalar normalizer."""
    from ..operators.sampling import mixture_temperature_rates

    docs = load_table(spark, sf_dir, "documents")
    return mixture_temperature_rates(docs, "source", alpha=0.5)


@register(
    "training_shuffle_topk",
    """
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
             ORDER BY substr(md5('shuf' || CAST(doc_id AS VARCHAR)), 1, 8),
                      doc_id) AS BIGINT) AS position
    FROM documents
    QUALIFY position <= 100
    """,
)
def q_training_shuffle_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 100 positions of the deterministic per-epoch corpus
    shuffle (operators/sampling.py:shuffle_order_topk): rank by
    md5(salt ‖ doc_id). LIMIT runs as TakeOrderedAndProject before the
    window, so the global row_number only ever sees 100 rows."""
    from ..operators.sampling import shuffle_order_topk

    docs = load_table(spark, sf_dir, "documents")
    return shuffle_order_topk(docs, "doc_id", 100)


# --- blocklist filtering audit -----------------------------------------------

_BLOCKLIST = ["slow", "dup"]


@register(
    "blocklist_filter_stats",
    r"""
    WITH t AS (
      SELECT source,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(list_filter(
                         string_split(
                           regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                           ' '),
                         x -> x IN ('slow', 'dup')))
             END AS hits
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_blocked_docs,
           CAST(SUM(hits) AS BIGINT) AS n_hits
    FROM t GROUP BY source
    """,
)
def q_blocklist_filter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style blocklist audit per source (operators/text.py:
    blocklist_stats): docs containing >= 1 blocklisted TOKEN (not
    substring) and total hits. Map-only tokenize + literal-array
    membership; one group agg."""
    from ..operators.text import blocklist_stats

    docs = load_table(spark, sf_dir, "documents")
    return blocklist_stats(docs, "text", "source", _BLOCKLIST)


# --- incremental corpus dedup ------------------------------------------------


@register(
    "incremental_dedup_new_batch",
    r"""
    WITH f AS (
      SELECT doc_id, source,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      FROM documents
    )
    SELECT n.doc_id AS id, n.fp
    FROM f n
    WHERE n.source = 'src0'
      AND NOT EXISTS (
        SELECT 1 FROM f c WHERE c.source <> 'src0' AND c.fp = n.fp
      )
    """,
)
def q_incremental_dedup_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest dedup (operators/dedup.py:incremental_dedup_new):
    treat src0 as the new batch, everything else as the lake; LEFT
    ANTI join on the normalized-content fingerprint keeps only docs
    not already in the corpus. At 100 TB this replaces full-corpus
    re-dedup per ingest with an O(|batch|) probe of a fingerprint
    index."""
    from ..operators.dedup import incremental_dedup_new

    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    return incremental_dedup_new(new, corpus)


# --- embedding storage ops ---------------------------------------------------


@register(
    "embedding_int8_quantize",
    """
    WITH q AS (
      SELECT vec_id AS id,
             list_max(list_transform(embedding,
                                     x -> abs(CAST(x AS DOUBLE)))) / 127.0
               AS scale,
             embedding
      FROM embeddings
    ), codes AS (
      SELECT id, scale,
             list_transform(embedding,
               x -> CASE WHEN scale = 0 THEN CAST(0 AS DOUBLE)
                         ELSE floor(CAST(x AS DOUBLE) / scale + 0.5) END)
               AS qs
      FROM q
    )
    SELECT id, ROUND(scale, 8) AS scale,
           CAST(list_sum(qs) AS BIGINT) AS q_sum,
           CAST(list_sum(list_transform(qs, v -> v * v)) AS BIGINT) AS q_l2
    FROM codes
    """,
)
def q_embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization audit (operators/similarity.py:
    int8_quantize_stats): per-vector scale + integer checksums of the
    codes. floor(x/scale + 0.5) written identically on both engines so
    rounding is a bit-identical double expression, not each engine's
    tie rule; code sums are integer-valued doubles (exact in IEEE), so
    summation order cannot matter."""
    from ..operators.similarity import int8_quantize_stats

    emb = load_table(spark, sf_dir, "embeddings")
    return int8_quantize_stats(emb)


def _rp_oracle(out_dims: int = 8, in_dims: int = 64) -> str:
    from ..operators.similarity import _jl_signs

    signs = _jl_signs(out_dims, in_dims)
    inv = 1.0 / math.sqrt(float(out_dims))
    cols = []
    for j in range(out_dims):
        terms = []
        for i, s in enumerate(signs[j]):
            op = "" if (i == 0 and s > 0) else ("- " if s < 0 else "+ ")
            terms.append(f"{op}CAST(embedding[{i + 1}] AS DOUBLE)")
        chain = " ".join(terms)
        cols.append(
            f"ROUND(({chain}) * CAST('{inv!r}' AS DOUBLE), 4) + 0.0 AS p{j}"
        )
    select = ",\n           ".join(cols)
    return f"SELECT vec_id AS id,\n           {select}\nFROM embeddings"


@register("embedding_random_projection", _rp_oracle())
def q_embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss ±1 projection 64 -> 8 dims
    (operators/similarity.py:random_projection). The seeded sign
    matrix is generated driver-side from md5 (engine-independent) and
    embedded as literals in BOTH plans; each output dim is the same
    left-to-right ± chain on both engines, so doubles are
    bit-identical before ROUND."""
    from ..operators.similarity import random_projection

    emb = load_table(spark, sf_dir, "embeddings")
    return random_projection(emb, in_dims=64, out_dims=8)


# --- tf-idf source summaries -------------------------------------------------


@register(
    "tfidf_top_source_terms",
    r"""
    WITH pairs AS (
      SELECT doc_id, source AS grp,
             unnest(string_split(
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
               AS term
      FROM documents
    ), p2 AS (SELECT * FROM pairs WHERE term <> ''),
    tf AS (
      SELECT grp, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM p2 GROUP BY grp, term
    ), dfq AS (
      SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS dfx
      FROM p2 GROUP BY term
    ), n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    scored AS (
      SELECT grp, term, tf, tf * ln(n.n / dfx) AS s
      FROM tf JOIN dfq USING (term) CROSS JOIN n
    )
    SELECT grp, term, tf, ROUND(s, 4) AS score
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY grp ORDER BY s DESC, term) <= 5
    """,
)
def q_tfidf_top_source_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic terms per source by tf-idf
    (operators/retrieval.py:tfidf_top_terms): one explode pass feeds
    both the (group, term) tf agg and the per-term doc frequency; the
    join is vocabulary-sized. ln divides INSIDE the log and tf
    multiplies after, identically on both engines."""
    from ..operators.retrieval import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, k=5)


# --- funnel + seasonal baseline ----------------------------------------------


@register(
    "events_funnel_conversion",
    """
    WITH ev AS (
      SELECT user_id AS u, floor(epoch(ts)) AS s, event_type AS t FROM events
    ), s0 AS (
      SELECT u, MIN(s) AS prev FROM ev WHERE t = 'view' GROUP BY u
    ), s1 AS (
      SELECT ev.u, MIN(ev.s) AS prev FROM ev
      JOIN s0 ON ev.u = s0.u AND ev.s > s0.prev
      WHERE ev.t = 'click' GROUP BY ev.u
    ), s2 AS (
      SELECT ev.u, MIN(ev.s) AS prev FROM ev
      JOIN s1 ON ev.u = s1.u AND ev.s > s1.prev
      WHERE ev.t = 'purchase' GROUP BY ev.u
    )
    SELECT CAST(0 AS BIGINT) AS stage_idx, 'view' AS stage,
           CAST((SELECT COUNT(*) FROM s0) AS BIGINT) AS n_users
    UNION ALL
    SELECT CAST(1 AS BIGINT), 'click', CAST((SELECT COUNT(*) FROM s1) AS BIGINT)
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'purchase',
           CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
    """,
)
def q_events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view -> click -> purchase funnel
    (operators/temporal.py:funnel_stage_counts): users reaching each
    stage strictly later (second granularity) than the previous one.
    One corpus shuffle on user_id; later stages join |users|-row
    tables co-partitioned on the same key."""
    from ..operators.temporal import funnel_stage_counts

    ev = load_table(spark, sf_dir, "events")
    return funnel_stage_counts(ev, ["view", "click", "purchase"])


@register(
    "events_hour_baseline",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), hod AS (
      SELECT event_type, CAST(hour(h) AS BIGINT) AS hod,
             CAST(COUNT(*) AS BIGINT) AS n_hours, SUM(n) AS tot
      FROM hourly GROUP BY 1, 2
    ), o AS (
      SELECT event_type, SUM(tot) / SUM(n_hours) AS mean FROM hod GROUP BY 1
    )
    SELECT hod.event_type, hod.hod, hod.n_hours,
           ROUND(CAST(tot AS DOUBLE) / n_hours, 4) AS avg_n,
           ROUND(CAST(tot AS DOUBLE) / (n_hours * mean), 4) AS lift
    FROM hod JOIN o ON hod.event_type = o.event_type
    """,
)
def q_events_hour_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal baseline per event type
    (operators/temporal.py:hour_of_day_baseline): mean hourly volume
    per (type, hour-of-day) and its lift over the type mean — the
    denominator that keeps a rate monitor from paging on the daily
    ramp. Two cascaded aggs; everything past the first shuffle is
    |types| x 24 rows."""
    from ..operators.temporal import hour_of_day_baseline

    ev = load_table(spark, sf_dir, "events")
    return hour_of_day_baseline(ev)
