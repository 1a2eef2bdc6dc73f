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

Writes the markdown rows to stdout for COVERAGE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as ep  # noqa: E402
from bootcamp_stackacademy_datalake_minio_airflow_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"
TENX = "/tmp/probe10x"
COPIES = 10
REPS = 2

DEFAULT = [
    "doc_dup_span_stats",
    "winnow_quotation_pairs",
    "corpus_datacard_sketch",
    "bpe_merge_table",
]


def build_tenx() -> None:
    os.makedirs(TENX, exist_ok=True)
    out = os.path.join(TENX, "documents.parquet")
    if not os.path.exists(out):
        duckdb.sql(
            f"""
            COPY (
              SELECT doc_id + c * 10000000 AS doc_id,
                     text || ' zq' || c AS text,
                     lang, source,
                     CAST(length(text || ' zq' || c) AS BIGINT) AS n_chars
              FROM read_parquet('{BASE}/documents.parquet'),
                   (SELECT unnest(range({COPIES})) AS c)
            ) TO '{out}' (FORMAT PARQUET)
            """
        )
    # every other table rides along unchanged (the probed queries are
    # documents-only; links keep load_table satisfied if one isn't)
    for f in os.listdir(BASE):
        if f.endswith(".parquet") and f != "documents.parquet":
            dst = os.path.join(TENX, f)
            if not os.path.exists(dst):
                try:
                    os.symlink(os.path.join(BASE, f), dst)
                except OSError:
                    shutil.copyfile(os.path.join(BASE, f), dst)


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    build_tenx()
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ep.queries()
    n1 = duckdb.sql(
        f"SELECT COUNT(*), SUM(length(text)) FROM read_parquet('{BASE}/documents.parquet')"
    ).fetchone()
    n10 = duckdb.sql(
        f"SELECT COUNT(*), SUM(length(text)) FROM read_parquet('{TENX}/documents.parquet')"
    ).fetchone()
    print(f"1x lake: {n1[0]} docs / {n1[1]} chars; 10x: {n10[0]} / {n10[1]}")
    print("| operator | 1x | 10x | time ratio | rows 1x -> 10x |")
    print("|---|---|---|---|---|")
    for name in names:
        fn = qs[name]
        fn(spark, WARM).count()  # JIT/codegen warm-up, untimed
        times: dict[str, float] = {}
        rows: dict[str, int] = {}
        for label, d in (("1x", BASE), ("10x", TENX)):
            best = float("inf")
            for _ in range(REPS):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                rows[label] = fn(spark, d).count()
                best = min(best, time.perf_counter() - t0)
            times[label] = best
        ratio = times["10x"] / times["1x"] if times["1x"] > 0 else float("inf")
        print(
            f"| `{name}` | {times['1x']:.1f}s | {times['10x']:.1f}s "
            f"| {ratio:.1f}x | {rows['1x']} -> {rows['10x']} |"
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
