"""Enumerate unpartitioned (global-order) Window nodes per registered
query (VERDICT r6 ask #4).

A `Window` physical node with an empty partition spec serializes as
`Window [fns...], [order...]` (two bracket groups) instead of
`Window [fns...], [part...], [order...]` (three); Spark warns
`WindowExec: No Partition Defined` at runtime because every row lands
in ONE task. That is fine for provably-tiny frames (a 5-row report, a
bounded group table) and inherent for true global-order semantics
(NTILE over a whole table, a table checksum's canonical order), but a
scale-killer if a corpus-sized frame sneaks in — this tool makes the
inventory mechanical so each site is either annotated or fixed.

Usage: python tools/window_audit.py [sf_dir] [query ...]
Prints one line per query that contains >= 1 unpartitioned Window,
with the window function list; exits 0 always (reporting tool).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from bootcamp_stackacademy_datalake_minio_airflow_spark import queries as q  # noqa: E402
from bootcamp_stackacademy_datalake_minio_airflow_spark.session import get_spark  # noqa: E402

def unpartitioned_windows(plan: str) -> list[str]:
    """Contexts of every ``windowspecdefinition`` whose partition spec
    is empty, from an executedPlan/optimizedPlan toString.

    A windowspecdefinition serializes its args as
    ``(part..., order... ASC|DESC ..., specifiedwindowframe(...))``;
    the partition spec is empty exactly when the FIRST argument is
    already an order column (carries ``ASC``/``DESC``) or the frame
    itself. (``Window [fns], [x]`` bracket-group counting is ambiguous:
    a partition-only window with no ORDER BY also prints two groups.)
    """
    out = []
    for m in re.finditer(r"windowspecdefinition\(", plan):
        start = m.end()
        # first top-level argument: scan to the first comma at depth 0
        depth = 0
        i = start
        while i < len(plan) and not (plan[i] == "," and depth == 0):
            if plan[i] == "(":
                depth += 1
            elif plan[i] == ")":
                if depth == 0:
                    break
                depth -= 1
            i += 1
        first_arg = plan[start:i]
        if first_arg.startswith("specifiedwindowframe") or re.search(
            r"\b(ASC|DESC)\b", first_arg
        ):
            ctx_start = plan.rfind("\n", 0, m.start()) + 1
            ctx = plan[ctx_start : m.start()].strip().lstrip("+-: *()0123456789 ")
            out.append((ctx + " OVER (" + first_arg + " ...)")[:160])
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("window-audit")
    hits: dict[str, list[str]] = {}
    for name, fn in q.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # report, don't die
            print(f"ERR   {name}: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        w = unpartitioned_windows(plan)
        if w:
            hits[name] = w
    for name, fns in sorted(hits.items()):
        print(f"{name}\t{len(fns)}\t{' | '.join(fns)}")
    print(f"\n{len(hits)} queries with unpartitioned Window nodes", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
