"""Standalone per-query timing, outside the full bench: cold reps of
a named subset, after the same warm-up discipline bench.py uses
(sf0.001 pre-pass per query, mapInPandas worker warm-up). Usage:

    python tools/time_queries.py q1 q2 ... [--reps=3] [--sf=/root/testdata/sf0.1]

Prints one line per query: name, cold reps, median. Used for the r12
optimization round's before/after A/B on touched queries without
paying a full 214-entry suite run per iteration.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as ep  # noqa: E402
from bootcamp_stackacademy_datalake_minio_airflow_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    sf_dir = "/root/testdata/sf0.1"
    warm_dir = "/root/testdata/sf0.001"
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ep.queries()
    missing = [n for n in names if n not in qs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")
    # process warm-up (JVM scan + python workers), as bench.py does
    next(iter(qs.values()))(spark, warm_dir).count()
    n_workers = spark.sparkContext.defaultParallelism * 2
    spark.range(n_workers * 4).repartition(n_workers).mapInPandas(
        lambda it: it, "id long"
    ).count()
    spark.catalog.clearCache()
    for n in names:
        fn = qs[n]
        try:
            fn(spark, warm_dir).count()  # per-query JIT/codegen warm-up
        except Exception as e:  # noqa: BLE001
            print(f"{n}: warmup error {e}", file=sys.stderr)
        runs = []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(round(time.perf_counter() - t0, 3))
        med = sorted(runs)[len(runs) // 2]
        print(f"{n:42s} med={med:7.3f}  reps={runs}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
