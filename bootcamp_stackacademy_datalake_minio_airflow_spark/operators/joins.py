"""Star-schema join helpers (reference J1-J4).

The reference chains four pandas left merges rooted at the fact table
(reference: scripts/silver_to_gold/ingestion_vendas_silver_to_gold.py:107-111).
Here the same left-deep chain is declared once; dimension sides that
are known-small get an explicit ``broadcast()`` hint so the fact table
never shuffles for them (broadcast-hash join), and only genuinely
large-large joins (fact x payments-pivot) fall back to a shuffled
sort-merge/hash join on the key -- which AQE can further convert or
skew-split at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def star_left_join(
    fact: DataFrame,
    dims: list[tuple[DataFrame, str | list[str], bool]],
) -> DataFrame:
    """Left-join each ``(dim, key, broadcast_hint)`` onto ``fact``.

    ``key`` uses the USING-style column-name form so join keys are not
    duplicated in the output (matches pandas merge-on-same-name
    semantics: one key column, reference J1-J4).
    """
    out = fact
    for dim, key, hint in dims:
        right = F.broadcast(dim) if hint else dim
        out = out.join(right, on=key, how="left")
    return out
