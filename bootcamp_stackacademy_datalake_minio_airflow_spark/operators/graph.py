"""Iterative graph algorithms on DataFrames (extension; absent in
reference).

Link-analysis scores are a standard corpus-curation signal (domain
authority for web-crawl filtering, item importance for catalog
ranking). PageRank here is the fixed-iteration power method expressed
as pure DataFrame joins — no GraphX/GraphFrames dependency, no driver
loops over data — so it inherits Spark's shuffle/AQE machinery and,
with every stage deterministic double math, an independent engine can
replay it iteration by iteration (the registered oracle unrolls the
same recurrence in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_edges(
    df: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """Symmetric co-occurrence edges ``(src, dst)``: items sharing a
    group, both directions, distinct.

    The self-join is keyed on the group column, so fan-out is bounded
    by max group size squared (TPC-H orders hold <= 7 items — the
    join is per-order local and skew-free). The distinct collapses
    multiplicity to an unweighted simple graph; one shuffle on the
    pair."""
    a = df.select(F.col(group_col).alias("__g"), F.col(item_col).alias("src"))
    b = df.select(F.col(group_col).alias("__g"), F.col(item_col).alias("dst"))
    return (
        a.join(b, "__g")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    state_round: int = 10,
    out_round: int = 6,
) -> DataFrame:
    """Fixed-iteration PageRank by power method over a symmetric edge
    set: ``rank'(v) = (1-d)/N + d * sum_{u->v} rank(u)/outdeg(u)``.

    Returns ``(node, pagerank)``. Each iteration is ONE shuffle (join
    ranks to edges on src, re-aggregate on dst); the edge+degree table
    is computed once and cached across iterations. Ranks are
    quantized to ``state_round`` decimals per iteration so the state
    an independent replay sees is bit-identical — unordered float
    summation drifts ~1e-16 per step, and without the quantization
    five iterations of compounding would make a cross-engine hash
    check flaky.

    Scale: at 1000 executors the rank table is |V| rows repartitioned
    by node; iterations reuse the cached edge partitioning, and the
    damping factor contracts any skew in convergence. Dangling nodes
    cannot exist here (a symmetric edge set gives every node an out-
    edge); for general digraphs add the dangling-mass redistribution
    term before reusing this.
    """
    e = edges.cache()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__outdeg"))
    ce = e.join(deg, "src").cache()
    nodes = e.select(F.col("src").alias("node")).distinct()
    n = nodes.count()
    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        ranks = (
            ce.join(ranks, ce.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("__outdeg")).alias("__c"),
            )
            .groupBy("node")
            .agg(
                F.round(
                    F.lit(base) + F.lit(damping) * F.sum("__c"), state_round
                ).alias("rank")
            )
        )
    out = ranks.select("node", F.round("rank", out_round).alias("pagerank"))
    # materialize (|V| rows) before releasing the cached edge tables
    # the lazy 5-join plan references — same memory discipline as the
    # dedup pair operators
    from .dedup import _materialize_release

    return _materialize_release(out, ce, e)
