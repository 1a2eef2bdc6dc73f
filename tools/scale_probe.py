"""10x scale probe (VERDICT r7 protocol, extended per r8 ask #2).

Builds a 10x documents lake — sf0.1 replicated with disjoint ids,
each replica perturbed by one appended token so copies are near- not
exact-dups (the r7 text-family protocol; the perturbation keeps the
content families honest about their HIT paths while ids stay
disjoint) — then times the named registered queries COLD at 1x
(sf0.1) and 10x in the same session, cache cleared between runs,
REPS reps each, reporting the per-query MIN (host-noise damping; the
probe asks "does the curve bend", not "what is the median").

Usage:
    python tools/scale_probe.py [query ...]     # default: the r8 four
    python tools/scale_probe.py --copies=100 doc_dup_span_stats
    python tools/scale_probe.py --copies=30 --scale-tables=lineitem \
        graph_triangle_counts

Writes the markdown rows to stdout for COVERAGE.md.

QUIET-HOST requirement (r11 incident): a probe that overlaps another
Spark job on this box reads garbage ratios — logreg_calibration_bins
measured 75.9x at 30x while the bench smoke shared the CPUs, and
15.0x on the quiet re-run. Per-query MIN damps noise WITHIN a run
but cannot correct a systematically loaded host; run probes alone.

Resource protocol for second-decade (>=30x) probes, measured r10:
set SPARK_DRIVER_MEMORY=64g — the corpus-gram localCheckpoint in the
dup-span family OOMs the default 8g single-JVM heap at 100x (passes
at 64g; on a cluster that state is partitioned across executors).
Disk is the other single-box ceiling: the triangle family's wedge+
edge shuffle spilled ~41 GB transiently at 30x and fills ~135 GB at
100x — check `df /tmp` before launching (spark.local.dir defaults to
/tmp) and prefer 30x when free disk is under ~150 GB.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb


def hashlib_md5(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode()).hexdigest()


sys.path.insert(0, ".")

import __spark_entry__ as ep  # noqa: E402
from bootcamp_stackacademy_datalake_minio_airflow_spark.catalog import link_donor_tables  # noqa: E402
from bootcamp_stackacademy_datalake_minio_airflow_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"
COPIES = 10
REPS = 2

DEFAULT = [
    "doc_dup_span_stats",
    "winnow_quotation_pairs",
    "corpus_datacard_sketch",
    "bpe_merge_table",
]

#: per-table replication SQL (c = copy index). documents follows the
#: r7 protocol (disjoint ids, one-token perturbation -> near- not
#: exact-dups); lineitem (opt-in, for the graph family) offsets BOTH
#: keys so each copy is a disjoint subgraph — the distinct edge set,
#: nodes, and triangles all scale by `copies`, which is what a graph
#: probe must stress (same-key replication would collapse in the
#: dedup and only stress the pre-distinct aggregate).
SCALE_SQL = {
    "documents": """
        SELECT doc_id + c * 10000000 AS doc_id,
               text || ' zq' || c AS text,
               lang, source,
               CAST(length(text || ' zq' || c) AS BIGINT) AS n_chars
        FROM read_parquet('{base}/documents.parquet'),
             (SELECT unnest(range({copies})) AS c)
    """,
    "lineitem": """
        SELECT * REPLACE (l_orderkey + c * 1000000 AS l_orderkey,
                          l_partkey + c * 100000 AS l_partkey)
        FROM read_parquet('{base}/lineitem.parquet'),
             (SELECT unnest(range({copies})) AS c)
    """,
    # disjoint user AND event ids per copy, timestamps unchanged —
    # each copy is a disjoint user universe over the SAME observation
    # window (the honest shape for survival/funnel probes: the
    # duration-day domain stays fixed while subjects scale)
    "events": """
        SELECT * REPLACE (event_id + c * 100000000 AS event_id,
                          user_id + c * 1000000 AS user_id)
        FROM read_parquet('{base}/events.parquet'),
             (SELECT unnest(range({copies})) AS c)
    """,
    # customer scales in lockstep with orders (same c_custkey offset
    # rule), so order->customer joins stay total on the scaled lake
    "customer": """
        SELECT * REPLACE (c_custkey + c * 1000000 AS c_custkey)
        FROM read_parquet('{base}/customer.parquet'),
             (SELECT unnest(range({copies})) AS c)
    """,
    # disjoint order AND customer keys so each copy is a disjoint
    # group universe — the honest shape for the bootstrap (per-key
    # draws stay distinct) and k-fold (group count scales) families.
    # o_orderkey uses the SAME c*1e6 offset as lineitem's l_orderkey
    # (ADVICE r10): a probe that scales both tables keeps every
    # orders<->lineitem join total instead of dangling for c>0
    "orders": """
        SELECT * REPLACE (o_orderkey + c * 1000000 AS o_orderkey,
                          o_custkey + c * 1000000 AS o_custkey)
        FROM read_parquet('{base}/orders.parquet'),
             (SELECT unnest(range({copies})) AS c)
    """,
    # disjoint ids + a 0.001*c shift on dim 1 so replicas are distinct
    # points (near- not exact-neighbors — the honest perturbation for
    # ANN/quantization probes, same spirit as the documents protocol)
    "embeddings": """
        SELECT vec_id + c * 100000 AS vec_id,
               list_prepend(CAST(embedding[1] + 0.001 * c AS FLOAT),
                            embedding[2:]) AS embedding,
               label
        FROM read_parquet('{base}/embeddings.parquet'),
             (SELECT unnest(range({copies})) AS c)
    """,
}


def build_lake(copies: int, tables: list[str], base: str = BASE) -> str:
    # a non-default base (e.g. the prose lake, r11 ask #7) gets its own
    # cache dir; the rule stamp below also embeds the base path via the
    # formatted SQL, so a same-named collision would still rebuild
    tag = "" if base == BASE else "_b" + hashlib_md5(base)[:8]
    out_dir = f"/tmp/probe{copies}x_{'_'.join(sorted(tables))}{tag}"
    os.makedirs(out_dir, exist_ok=True)
    for t in tables:
        out = os.path.join(out_dir, f"{t}.parquet")
        sql = SCALE_SQL[t].format(base=base, copies=copies)
        # rule-fingerprint stamp (r11 self-review): the cache was
        # keyed on PATH alone, so editing a table's replication SQL
        # (e.g. the r11 orders-offset unification) left older /tmp
        # lakes silently feeding the new probes — the prose-lake
        # staleness lesson, reapplied here
        import hashlib

        stamp = out + ".rule"
        fp = hashlib.md5(sql.encode()).hexdigest()
        fresh = (
            os.path.exists(out)
            and os.path.exists(stamp)
            and open(stamp).read().strip() == fp
        )
        if not fresh:
            if os.path.exists(out):
                os.remove(out)
            duckdb.sql(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
            with open(stamp, "w") as f:
                f.write(fp)
    # every other table rides along unchanged (links keep load_table
    # satisfied for tables the probed queries don't scale); the shared
    # helper re-points stale/dangling links if BASE ever changes
    link_donor_tables(base, out_dir, exclude={f"{t}.parquet" for t in tables})
    return out_dir


def main() -> None:
    args = sys.argv[1:]
    copies = COPIES
    tables = ["documents"]
    base = BASE
    names: list[str] = []
    for a in args:
        if a.startswith("--copies="):
            copies = int(a.split("=", 1)[1])
        elif a.startswith("--scale-tables="):
            tables = a.split("=", 1)[1].split(",")
        elif a.startswith("--base="):
            # replication source override (r11 ask #7): lets the probe
            # scale a non-sf lake — e.g. the real-prose lake — so the
            # proselake twins' plan can be probed on prose content
            base = a.split("=", 1)[1].rstrip("/")
        else:
            names.append(a)
    names = names or DEFAULT
    if copies < 2:
        # copies=1 would label both legs "1x" and silently self-compare
        sys.exit("--copies must be >= 2 (the probe compares 1x vs Nx)")
    unknown_tables = [t for t in tables if t not in SCALE_SQL]
    if unknown_tables:
        sys.exit(
            f"--scale-tables: no replication SQL for {unknown_tables}; "
            f"supported: {sorted(SCALE_SQL)}"
        )
    big_dir = build_lake(copies, tables, base)
    nx = f"{copies}x"
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ep.queries()
    for t in tables:
        a = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet('{base}/{t}.parquet')"
        ).fetchone()
        b = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet('{big_dir}/{t}.parquet')"
        ).fetchone()
        print(f"{t}: 1x {a[0]} rows; {nx} {b[0]} rows")
    print(f"| operator | 1x | {nx} | time ratio | rows 1x -> {nx} |")
    print("|---|---|---|---|---|")
    for name in names:
        fn = qs[name]
        fn(spark, WARM).count()  # JIT/codegen warm-up, untimed
        times: dict[str, float] = {}
        rows: dict[str, int] = {}
        for label, d in (("1x", base), (nx, big_dir)):
            best = float("inf")
            for _ in range(REPS):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                rows[label] = fn(spark, d).count()
                best = min(best, time.perf_counter() - t0)
            times[label] = best
        ratio = times[nx] / times["1x"] if times["1x"] > 0 else float("inf")
        print(
            f"| `{name}` | {times['1x']:.1f}s | {times[nx]:.1f}s "
            f"| {ratio:.1f}x | {rows['1x']} -> {rows[nx]} |"
        )
        sys.stdout.flush()
    # explicit stop: with tens of GB of localCheckpoint/shuffle blocks
    # live, the implicit atexit teardown can hang the process for
    # minutes after the last row prints (observed on the r10 100x
    # runs); stopping the context inline releases blocks while the
    # JVM is still healthy.
    spark.stop()


if __name__ == "__main__":
    main()
