"""End-to-end training-data curation pipeline (extension; the
reference — scripts/silver_to_gold/ingestion_vendas_silver_to_gold.py
— has a single BI query and no curation stage of any kind).

Chains the corpus operators into the canonical pretraining-data flow:

    quality filter -> exact dedup -> per-source quota -> split labels

Every stage is deterministic (threshold on a reproducible score, md5
order statistics, md5 range splits), so the whole pipeline output is a
pure function of the input corpus — re-running it on the same data, on
any cluster size, yields byte-identical results, and an external SQL
engine can audit it end to end.

Plan shape at 100 TB: the quality filter is a map-side projection that
pushes nothing to Python; dedup is one hash shuffle on the text hash;
quota is one shuffle on source; the split label is map-side. Three
total exchanges, each keyed differently because each answers a
different question — there is no reusable partitioning to exploit
between them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.dedup import dedup_exact
from ..operators.sampling import hash_split, stratified_quota
from ..operators.text import quality_score


def curate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    min_quality: float = 0.5,
    quota_per_source: int | None = None,
    split_weights: dict[str, float] | None = None,
) -> DataFrame:
    """Run the full curation flow; returns the curated corpus with a
    ``quality`` column and (when ``split_weights``) a ``split`` column.
    """
    scored = df.withColumn("quality", quality_score(text_col))
    kept = scored.filter(scored["quality"] >= min_quality)
    deduped = kept.select(*df.columns, "quality")
    deduped = dedup_exact(deduped, [text_col], order_by=id_col)
    if quota_per_source is not None:
        deduped = stratified_quota(deduped, source_col, id_col, quota_per_source)
    if split_weights:
        deduped = hash_split(deduped, id_col, split_weights)
    return deduped
