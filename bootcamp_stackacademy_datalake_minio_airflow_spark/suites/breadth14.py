"""Round-7 breadth: corpus-LM quality signals.

``doc_unigram_cross_entropy`` is the CCNet-style perplexity-filter
signal with the corpus itself as the unigram LM (Wenzek et al. 2020
filter CommonCrawl by LM perplexity; at curation time the corpus
unigram model is the zero-dependency stand-in). The reference has no
text analysis at all (SURVEY §2 marks the category absent).

Oracle discipline (house rules): identical aliases both sides; token
and term counts are integer-exact end to end; the single emitted
float is the final per-doc average, produced by the identical
multiply-then-divide-then-log2 chain on both engines and ROUNDed
identically (+0.0 to normalize IEEE negative zero — a doc whose every
term has corpus probability 1 lands exactly on -0.0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.text import unigram_cross_entropy
from ..queries import register

_NORM_SQL = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"

_UNIGRAM_CE_ORACLE = rf"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS w
      FROM documents
      WHERE text IS NOT NULL AND length(trim(text)) > 0
    ), dw AS (
      SELECT doc_id, w, COUNT(*) AS c FROM toks GROUP BY 1, 2
    ), vocab AS (
      SELECT w, CAST(SUM(c) AS BIGINT) AS tf FROM dw GROUP BY w
    ), tot AS (
      SELECT CAST(SUM(tf) AS BIGINT) AS n FROM vocab
    )
    SELECT dw.doc_id,
           CAST(SUM(dw.c) AS BIGINT) AS n_tokens,
           ROUND(-SUM(dw.c * log2(vocab.tf / CAST(tot.n AS DOUBLE)))
                 / SUM(dw.c), 4) + 0.0 AS cross_entropy
    FROM dw JOIN vocab USING (w) CROSS JOIN tot
    GROUP BY dw.doc_id
    """


@register("doc_unigram_cross_entropy", _UNIGRAM_CE_ORACLE)
def q_unigram_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return unigram_cross_entropy(docs, "doc_id", "text")
