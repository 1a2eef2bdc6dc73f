"""Kaplan-Meier survival estimation over an event stream — the
censoring-aware time-to-event curve (`retention_cohorts` reports raw
day-k return rates; KM is the estimator that stays unbiased when
some subjects never reach the event inside the observation window).
The reference has no analytics at all (SURVEY §2); this extends the
event-analytics family.

Distributed shape: one groupBy(user) pass reduces the stream to a
per-user (duration, death|censored) row, which collapses to one row
per DISTINCT duration day before any window — the KM windows run
over a table bounded by the observation span in days (tens of rows
at any corpus size), never over users or events. That bounded domain
is the justification for the unpartitioned windows (COVERAGE
window-audit table; tests/test_window_guard.py allowlist).

Determinism contract: at-risk/death counts are integer-exact; the
survival product is exp(cumulative SUM of ln((n-d)/n)) in ASC
duration order on BOTH engines (ties impossible — the domain is
distinct days), terms guarded to 0.0 at d = n with a cumulative
zero flag so ln(0) never evaluates; the only emitted float is
ROUND(survival, 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier_time_to_event(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    target_type: str = "purchase",
) -> DataFrame:
    """KM survival for time-to-first-``target_type``: per user,
    duration = days from their first event to their first target
    event (a DEATH); users who never reach the target are CENSORED at
    their last observed day (at risk through it, never a death).
    Returns one row per death time: (t_days, n_at_risk, n_deaths,
    survival)."""
    per_user = df.groupBy(user_col).agg(
        F.to_date(F.min(ts_col)).alias("__first"),
        F.to_date(
            F.min(F.when(F.col(type_col) == target_type, F.col(ts_col)))
        ).alias("__target"),
        F.to_date(F.max(ts_col)).alias("__last"),
    )
    lt = per_user.select(
        F.when(
            F.col("__target").isNotNull(),
            F.datediff("__target", "__first"),
        )
        .otherwise(F.datediff("__last", "__first"))
        .cast("int")
        .alias("__t"),
        F.when(F.col("__target").isNotNull(), 1).otherwise(0).alias("__death"),
    )
    # one row per distinct duration day — the bounded KM domain
    tt = lt.groupBy("__t").agg(
        F.sum("__death").cast("long").alias("__d"),
        F.count("*").cast("long").alias("__m"),
    )
    w = Window.orderBy("__t").rowsBetween(Window.unboundedPreceding, 0)
    cum_leave = F.sum("__m").over(w)
    total = F.sum("__m").over(
        Window.orderBy("__t").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    n_risk = (total - cum_leave + F.col("__m")).alias("__n")
    staged = tt.select("__t", "__d", "__m", n_risk)
    term = F.when(
        F.col("__d") < F.col("__n"),
        F.log((F.col("__n") - F.col("__d")) * 1.0 / F.col("__n")),
    ).otherwise(F.lit(0.0))
    zero = F.when(F.col("__d") == F.col("__n"), 1).otherwise(0)
    w2 = Window.orderBy("__t").rowsBetween(Window.unboundedPreceding, 0)
    surv = F.when(F.max(zero).over(w2) == 1, F.lit(0.0)).otherwise(
        F.round(F.exp(F.sum(term).over(w2)), 4)
    )
    return (
        staged.select(
            F.col("__t").alias("t_days"),
            F.col("__n").alias("n_at_risk"),
            F.col("__d").alias("n_deaths"),
            surv.alias("survival"),
        )
        .filter(F.col("n_deaths") > 0)
    )
