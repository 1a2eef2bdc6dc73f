"""Dump the formatted physical plan of every registered query to
PLANS.md — the plan-quality audit artifact. Usage:

    python tools/explain_all.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import __spark_entry__ as ep  # noqa: E402
from bootcamp_stackacademy_datalake_minio_airflow_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("explain-all", master="local[4]", shuffle_partitions=4)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    out = ["# PLANS — formatted physical plan per registered query\n"]
    out.append(f"Generated against `{sf_dir}`. Things to look for: `PushedFilters`")
    out.append("(predicate pushdown), minimal `ReadSchema` (column pruning),")
    out.append("`BroadcastHashJoin` on dimension joins, `TakeOrderedAndProject`")
    out.append("for top-k, partial+final `HashAggregate` pairs (map-side combine).\n")
    for name, fn in ep.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001
            plan = f"(error: {e})"
        out.append(f"\n## {name}\n\n```\n{plan.strip()}\n```")

    with open("PLANS.md", "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote PLANS.md ({len(ep.queries())} plans)")


if __name__ == "__main__":
    main()
