"""Training-sequence packing: greedy first-fit-in-order binning of
documents into fixed token-budget context windows.

The sequential-looking part (a resetting running sum) is confined to
independent hash buckets: documents are assigned to ``n_buckets``
deterministic buckets, and the greedy scan runs per bucket inside one
Arrow batch (``applyInPandas``). At corpus scale buckets are the unit
of parallelism — thousands of buckets, each a bounded slice of the
corpus — so no task ever sees more than corpus/n_buckets rows and the
only shuffle is the bucket repartition.

Determinism: bucket = id % n_buckets and the scan order is id-ascending
within the bucket, so output is a pure function of the input (the
DuckDB oracle replays the same greedy recurrence with a recursive CTE).

No counterpart in the reference (pure pandas ETL); this is part of the
LLM-training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col,
    budget: int = 256,
    n_buckets: int = 8,
) -> DataFrame:
    """Assign each document a ``(bucket, pack_id)`` training-window slot.

    Greedy first-fit-in-order: walk the bucket's documents in id order,
    accumulate token counts, start a new pack when the next document
    would overflow ``budget``. An oversized document (> budget) gets a
    pack of its own — never dropped, never split.

    Returns (bucket, pack_id, <id_col>, n_tok); pack_id restarts at 0
    per bucket.
    """
    import pandas as pd

    base = df.select(
        F.col(id_col).cast("long").alias("__id"),
        F.pmod(F.col(id_col).cast("long"), F.lit(n_buckets)).alias("bucket"),
        token_count_col.cast("long").alias("n_tok"),
    ).filter(
        # a NULL token count (e.g. NULL document text) cannot be
        # packed — and unguarded it reaches the greedy scan as pandas
        # NaN, where int(NaN) KILLS the task (found by the NULL tier
        # of tools/degenerate_data.py). Excluded explicitly; the
        # oracle mirrors with WHERE text IS NOT NULL.
        F.col("n_tok").isNotNull()
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id").reset_index(drop=True)
        pack_ids = []
        pack, acc = 0, 0
        first = True
        for n in pdf["n_tok"]:
            n = int(n)
            if first:
                acc = n
                first = False
            elif acc + n <= budget:
                acc += n
            else:
                pack += 1
                acc = n
            pack_ids.append(pack)
        return pd.DataFrame(
            {
                "bucket": pdf["bucket"],
                "pack_id": pack_ids,
                "__id": pdf["__id"],
                "n_tok": pdf["n_tok"],
            }
        )

    out = base.groupBy("bucket").applyInPandas(
        _pack, f"bucket long, pack_id long, __id long, n_tok long"
    )
    return out.withColumnRenamed("__id", id_col)
