"""Filter-funnel attribution (extension; absent in reference).

Every curation pipeline is a cascade of kill rules (too short, wrong
language, low quality, repetitive, ...). When 40% of a crawl
disappears, "which rule ate my data" is the first operational
question — so the funnel must ATTRIBUTE each rejected row to the
FIRST rule that killed it and report per-stage in/killed/out counts,
not just the final survivor count.

Shape: attribution is a single ordered CASE chain evaluated map-side
(one pass, whole-stage codegen — rules are plain Column predicates);
the report is one groupBy over the ≤|rules|+1 label space plus a
window over that tiny table. Cost is O(rows) with one aggregation
shuffle whose key space is the rule list — the same plan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: attribution label for rows no rule killed
SURVIVOR = "__survived__"


def funnel_attribution(
    df: DataFrame,
    rules: list[tuple[str, Column]],
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-row first-kill attribution: ``(id_col, killed_by)`` where
    ``killed_by`` is the name of the FIRST rule (in list order) whose
    predicate is true, or NULL for survivors.

    A predicate evaluating to NULL counts as "did not fire" (CASE
    semantics) — rules that must catch NULL payloads say so
    explicitly (e.g. ``col.isNull()``), keeping NULL handling a
    visible part of the rule spec rather than an engine accident.
    """
    if not rules:
        raise ValueError("funnel needs at least one rule")
    expr = None
    for name, pred in rules:
        expr = F.when(pred, name) if expr is None else expr.when(pred, name)
    return df.select(
        F.col(id_col),
        expr.otherwise(F.lit(None).cast("string")).alias("killed_by"),
    )


def funnel_report(
    df: DataFrame,
    rules: list[tuple[str, Column]],
    id_col: str = "doc_id",
) -> DataFrame:
    """Stage-by-stage funnel report: one row per rule, in cascade
    order, with ``(stage, rule, n_in, n_killed, n_out)`` — ``n_in``
    is the rows that reached the stage, ``n_out = n_in - n_killed``
    feeds the next stage, and the last ``n_out`` is the survivor
    count. Rules that killed nothing still appear (n_killed = 0).

    All counts are integer-exact (no float can split the cross-engine
    hash). The per-rule count table is ≤|rules|+1 rows, so the
    cumulative window and the rule-list join are driver-trivial while
    the only full-data pass is the attribution aggregation.
    """
    att = funnel_attribution(df, rules, id_col)
    counts = att.groupBy(
        F.coalesce("killed_by", F.lit(SURVIVOR)).alias("rule")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_killed"))
    return funnel_report_from_counts(counts, rules)


def funnel_report_from_counts(
    counts: DataFrame,
    rules: list[tuple[str, Column]],
) -> DataFrame:
    """The funnel-report arithmetic over an ALREADY-AGGREGATED count
    table ``(rule, n_killed)`` that includes the ``SURVIVOR`` label —
    shared by the batch path above and the streaming monitor
    (streaming/curation.py), so stream and batch reports come from
    one implementation.
    """
    if not rules:
        raise ValueError("funnel needs at least one rule")
    # Everything below is arithmetic on the ≤|rules|+1-row count
    # table — ONE full pass over the input, total included. The
    # total is a whole-table window over counts (not a separate
    # .agg(), which would re-evaluate the attribution subtree —
    # Spark does not CSE across DataFrame branches), and it must
    # survive the stage join even when a rule killed nothing, so the
    # stage list carries a SENTINEL survivor stage that always
    # matches the survivor count row; it is filtered out at the end.
    wall = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    counts = counts.withColumn(
        "__total", F.sum("n_killed").over(wall).cast("long")
    )
    names = [name for name, _ in rules] + [SURVIVOR]
    stages = counts.sparkSession.range(1).select(
        F.posexplode(F.array(*[F.lit(n) for n in names])).alias("__pos", "rule")
    )
    joined = stages.join(counts, "rule", "left").select(
        (F.col("__pos") + 1).cast("int").alias("stage"),
        "rule",
        F.coalesce("n_killed", F.lit(0).cast("long")).alias("n_killed"),
        "__total",
    )
    # empty input => counts is empty => every __total is NULL => 0
    total = F.coalesce(F.max("__total").over(wall), F.lit(0).cast("long"))
    # single-partition windows are fine: the frame holds ≤|rules|+1 rows
    w = Window.orderBy("stage").rowsBetween(Window.unboundedPreceding, -1)
    prior = F.coalesce(F.sum("n_killed").over(w), F.lit(0).cast("long"))
    return (
        joined.select(
            "stage",
            "rule",
            (total - prior).cast("long").alias("n_in"),
            "n_killed",
            (total - prior - F.col("n_killed")).cast("long").alias("n_out"),
        )
        .filter(F.col("rule") != SURVIVOR)
    )
