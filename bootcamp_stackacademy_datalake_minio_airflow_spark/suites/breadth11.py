r"""Round-5 breadth (third block): asymmetric n-gram containment
join — the partial-duplication detector Jaccard structurally misses.

Oracle discipline (house rules): identical aliases both sides; ROUND
on derived floats with the identical expression applied in the
filter on BOTH engines so boundary pairs land on the same side; the
oracle is the brute-force all-pairs intersection, so it PROVES the
prefix-filter + size-cut candidate generation is lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..queries import register

# --- asymmetric n-gram containment pairs ------------------------------------

_CONTAINMENT_ORACLE = """
    WITH norm AS (
      SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
                                          i -> array_to_string(toks[i:i+2], ' '))) AS s
      FROM (SELECT doc_id, string_split(t, ' ') AS toks FROM norm)
    ), ex AS (
      SELECT doc_id, unnest(s) AS g FROM sh
    ), sizes AS (
      SELECT doc_id, len(s) AS n FROM sh
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(CAST(i AS DOUBLE) / na.n, 4) AS containment
    FROM inter JOIN sizes na ON na.doc_id = id_a
    WHERE ROUND(CAST(i AS DOUBLE) / na.n, 4) >= 0.8
    """


@register("dedup_ngram_containment_pairs", _CONTAINMENT_ORACLE)
def q_ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered pairs where >= 80% of A's word-3-grams appear in B —
    quote/boilerplate inclusion detection (a paragraph embedded in a
    much larger page has Jaccard ~0 but containment ~1). The oracle
    brute-forces every pair, proving the asymmetric prefix filter in
    operators/dedup.py:ngram_containment_pairs drops nothing."""
    from ..operators.dedup import ngram_containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    return ngram_containment_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
