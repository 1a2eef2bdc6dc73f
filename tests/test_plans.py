"""Physical-plan regression tests: the shapes that must survive a
100x scale-up (pushdown, pruning, broadcast, top-k without global
sort). A green result here means Catalyst still compiles our
declarative plans to the intended physical strategies."""

from __future__ import annotations

import __spark_entry__ as ep


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = ep.queries()["filter_predicates"](spark, sf_dir)
    plan = _formatted(df)
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(l_quantity,10.0)" in plan
    assert "In(l_returnflag, [A,R])" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = ep.queries()["tpch_q3_shaped"](spark, sf_dir)
    plan = _formatted(df)
    # customer scan must read only the two needed columns
    assert "struct<c_custkey:bigint,c_mktsegment:string>" in plan


def test_vendas_dimensions_broadcast(spark, sf_dir):
    df = ep.queries()["vendas_flagship"](spark, sf_dir)
    plan = _executed_plan(df)
    assert plan.count("BroadcastHashJoin") >= 3  # orders/products/customers
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") <= 1


def test_topk_compiles_to_take_ordered(spark, sf_dir):
    df = ep.queries()["sort_limit_topk"](spark, sf_dir)
    assert "TakeOrderedAndProject" in _executed_plan(df)


def test_pivot_has_no_distinct_discovery_job(spark, sf_dir):
    # pinned pivot values -> single aggregate; an unpinned pivot plans
    # an extra collect of distinct payment_type values before this
    df = ep.queries()["pivot_sum_payments"](spark, sf_dir)
    plan = _executed_plan(df)
    assert "HashAggregate" in plan


def test_q6_aggregates_without_shuffle_of_rows(spark, sf_dir):
    # scan-side filters + partial aggregation: the only exchange moves
    # per-partition partial sums, not filtered rows
    df = ep.queries()["tpch_q6_shaped"](spark, sf_dir)
    plan = _formatted(df)
    assert "PushedFilters: [" in plan and "l_shipdate" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final
