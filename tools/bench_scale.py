"""10x scale-bench artifact over the top-10 most expensive registry
queries (VERDICT r11 ask #3).

The per-round BENCH artifact is sf0.1-only; the scale-probe rows in
COVERAGE.md are prose. This tool turns "plans that survive 100x" into
a committed artifact: it ranks registry queries by the cold median in
the committed BENCH_FULL.json, takes the top 10, builds the stamped
10x lake (every table with a replication rule in
tools/scale_probe.SCALE_SQL — documents, lineitem, orders, customer,
events, embeddings — so joins stay total per the c-offset key rules),
and times each query REPS reps cold per leg, recording median AND min.

Protocol (v2 — the v1 interleaved-legs run was discarded): each leg
(1x, 10x) runs in its OWN SparkSession with its own untimed sf0.001
pre-pass over all selected queries, because a leg sharing a JVM with
the other leg's monster runs inherits their GC/shuffle-cleanup
aftermath — v1 measured graph_pagerank_parts at 0.5x and three 1x
legs 3x slower than their committed colds purely from run order.
Per-leg sessions make the two legs' JVM states comparable (both
JIT-warmed by an identical pre-pass, neither polluted by the other's
heap) — the same reasoning as bench.py's r12 global warm-up pre-pass.

Graph queries follow the bench.py convention: the shared
co-occurrence edge projection (suites/graph_shared.py) is built
untimed once per leg and timed as its own "graph_edge_build" row, so
the three graph queries report their marginal cost at both scales
and the build's own scaling is a visible row rather than noise
attributed to whichever graph query runs first.

Prose-lake queries (proselake_*) are EXCLUDED with a recorded reason:
they read the fixed real-prose lake and ignore sf_dir, so a scaled
sf lake cannot move them — their synthetic twins over documents are
rankable and probe the same plan. The exclusion is written into the
artifact (the "no silent caps" rule), and the next-ranked queries
take the freed slots.

QUIET-HOST requirement (r11 incident, same as scale_probe): run this
alone — an overlapping Spark job inflates ratios unrecoverably.

Usage:
    python tools/bench_scale.py            # writes BENCH_SCALE.json
    python tools/bench_scale.py --copies=10 --top=10 --reps=3
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import __spark_entry__ as ep  # noqa: E402
from scale_probe import BASE, SCALE_SQL, WARM, build_lake  # noqa: E402

from bootcamp_stackacademy_datalake_minio_airflow_spark.session import get_spark  # noqa: E402
from bootcamp_stackacademy_datalake_minio_airflow_spark.suites import graph_shared  # noqa: E402

ARTIFACT = "BENCH_SCALE.json"


def rank_top(n: int) -> tuple[list[str], list[dict]]:
    """Top-n registry queries by BENCH_FULL cold median, skipping
    sf_dir-independent prose-lake entries (reason recorded)."""
    with open("BENCH_FULL.json") as f:
        bench = json.load(f)
    registry = set(ep.queries())
    excluded: list[dict] = []
    ranked: list[str] = []
    order = sorted(
        (
            (name, t)
            for name, t in bench["queries"].items()
            if name in registry and isinstance(t, (int, float)) and t > 0
        ),
        key=lambda kv: -kv[1],
    )
    for name, t in order:
        if len(ranked) >= n:
            break
        if name.startswith("proselake_"):
            excluded.append(
                {
                    "query": name,
                    "cold_s": t,
                    "reason": "reads the fixed real-prose lake (ignores "
                    "sf_dir); scaled-lake probe of this plan runs via the "
                    "synthetic documents twin",
                }
            )
            continue
        ranked.append(name)
    return ranked, excluded


def run_leg(label: str, d: str, names: list[str], reps: int) -> dict[str, dict]:
    """One fresh-session leg: pre-pass warm-up, edge build row, then
    reps cold runs per query (cache cleared before each)."""
    qs = ep.queries()
    spark = get_spark(f"bench-scale-{label}")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    try:
        # untimed pre-pass: JIT/codegen for every selected query, plus
        # the Python-worker/broadcast one-timers (bench.py protocol)
        spark.range(256).repartition(64).mapInPandas(
            lambda it: it, "id long"
        ).count()
        for name in names:
            try:
                qs[name](spark, WARM).count()
            except Exception as e:  # noqa: BLE001
                print(f"warm-up error in {name}: {e}", file=sys.stderr)
        spark.catalog.clearCache()

        # shared graph edge projection: timed as its own row (evicted
        # before every rep so each rep pays the real build), then left
        # CACHED so graph queries below report marginal cost — the
        # bench.py convention at both scales.
        graph_shared.part_cooccurrence_edges(spark, WARM)  # untimed JIT
        times: list[float] = []
        for rep in range(reps):
            evicted = graph_shared.evict(spark, d)
            assert rep == 0 or evicted, "evict found no entry after a build"
            t0 = time.perf_counter()
            graph_shared.part_cooccurrence_edges(spark, d)
            times.append(time.perf_counter() - t0)
        out["graph_edge_build"] = {
            "median_s": round(statistics.median(times), 3),
            "min_s": round(min(times), 3),
            "rows": -1,
        }

        for name in names:
            fn = qs[name]
            times = []
            rows = -1
            for _ in range(reps):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                rows = fn(spark, d).count()
                times.append(time.perf_counter() - t0)
            out[name] = {
                "median_s": round(statistics.median(times), 3),
                "min_s": round(min(times), 3),
                "rows": rows,
            }
            print(
                f"  [{label}] {name}: med {out[name]['median_s']}s "
                f"min {out[name]['min_s']}s rows {rows}",
                file=sys.stderr,
            )
            spark.catalog.clearCache()
    finally:
        spark.stop()
    return out


def main() -> None:
    copies, top_n, reps = 10, 10, 3
    for a in sys.argv[1:]:
        if a.startswith("--copies="):
            copies = int(a.split("=", 1)[1])
        elif a.startswith("--top="):
            top_n = int(a.split("=", 1)[1])
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
    if copies < 2:
        sys.exit("--copies must be >= 2 (compares 1x vs Nx)")

    names, excluded = rank_top(top_n)
    tables = sorted(SCALE_SQL)
    big_dir = build_lake(copies, tables)
    nx = f"{copies}x"

    legs = {
        "1x": run_leg("1x", BASE, names, reps),
        nx: run_leg(nx, big_dir, names, reps),
    }

    results: dict[str, dict] = {}
    print(f"| operator | 1x med | {nx} med | ratio | rows 1x -> {nx} |")
    print("|---|---|---|---|---|")
    for name in ["graph_edge_build"] + names:
        r1, rn = legs["1x"][name], legs[nx][name]
        m1, mn = r1["median_s"], rn["median_s"]
        ratio = round(mn / m1, 2) if m1 > 0 else float("inf")
        results[name] = {"1x": r1, nx: rn, "ratio_median": ratio}
        print(
            f"| `{name}` | {m1:.2f}s | {mn:.2f}s | {ratio:.1f}x "
            f"| {r1['rows']} -> {rn['rows']} |"
        )

    artifact = {
        "protocol": "top-N registry queries by BENCH_FULL cold median; "
        "stamped replicated lake (disjoint keys, near-dup perturbation); "
        "one fresh SparkSession per leg, each with an untimed sf0.001 "
        "pre-pass over all selected queries; shared graph edge "
        "projection timed as its own row (evicted per rep) and cached "
        "for the graph queries' marginal-cost rows; "
        f"{reps} cold reps per leg, SQL cache cleared between reps; "
        "quiet host",
        "sf_base": BASE,
        "copies": copies,
        "reps": reps,
        "scaled_tables": tables,
        "queries": results,
        "excluded": excluded,
    }
    with open(ARTIFACT, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"\nwrote {ARTIFACT}")


if __name__ == "__main__":
    main()
