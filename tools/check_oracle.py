"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, then compares row count,
column names, and an order-insensitive value hash. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as ep  # noqa: E402
from bootcamp_stackacademy_datalake_minio_airflow_spark.catalog import (  # noqa: E402
    TESTDATA_TABLES,
)
from bootcamp_stackacademy_datalake_minio_airflow_spark.session import get_spark  # noqa: E402


def _norm_cell(v) -> str:
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if v != v:
            return "\0NULL"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(rows: list[tuple], col_order: list[int]) -> str:
    lines = sorted(
        "\x1f".join(_norm_cell(r[i]) for i in col_order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir.rstrip('/')}/{t}.parquet'"
        )

    qs, oracles = ep.queries(), ep.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"WARN  unknown query names (typo?): {sorted(unknown)}")
    failures = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_rows = [tuple(r) for r in sdf.collect()]
            s_cols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"rows-only  {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(sql)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue

        ok = True
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL  {name}: cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
            ok = False
        if len(s_rows) != len(d_rows):
            print(f"FAIL  {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            ok = False
        if ok:
            # Type-fidelity audit (mimics the driver's pandas canon):
            # DuckDB HUGEINT/int128 lands as float64 or object in pandas
            # while Spark emits int64 — the driver's value hash can never
            # match then, even when str() of the values agrees. Kinds
            # come from the SCHEMAS (Spark dtypes + a DESCRIBE of the
            # oracle), not from re-executing both queries — the previous
            # toPandas()/re-execute pair roughly doubled gate runtime.
            _SPARK_KIND = {"tinyint": "i", "smallint": "i", "int": "i",
                           "bigint": "i", "float": "f", "double": "f"}
            _DUCK_KIND = {"TINYINT": "i", "SMALLINT": "i", "INTEGER": "i",
                          "BIGINT": "i", "HUGEINT": "O", "UBIGINT": "O",
                          "FLOAT": "f", "DOUBLE": "f"}
            try:
                s_kinds = {c: _SPARK_KIND.get(t, "O") for c, t in sdf.dtypes}
                d_kinds = {
                    r[0]: _DUCK_KIND.get(str(r[1]).split("(")[0], "O")
                    for r in con.execute(f"DESCRIBE {sql}").fetchall()
                }
                for c in sorted(s_cols):
                    sk, dk = s_kinds[c], d_kinds[c]
                    if "i" in (sk, dk) and sk != dk:
                        print(
                            f"FAIL  {name}: dtype fidelity col={c} "
                            f"spark-kind={sk} duck-kind={dk} "
                            "(driver hash would mismatch; CAST the oracle)"
                        )
                        ok = False
            except Exception as e:  # noqa: BLE001
                print(f"WARN  {name}: dtype audit skipped: {e}")
        if ok:
            s_order = [s_cols.index(c) for c in sorted(s_cols)]
            d_order = [d_cols.index(c) for c in sorted(d_cols)]
            sh, dh = value_hash(s_rows, s_order), value_hash(d_rows, d_order)
            if sh != dh:
                print(f"FAIL  {name}: hash spark={sh} duck={dh}")
                # show a sample diff
                s_set = {
                    "\x1f".join(_norm_cell(r[i]) for i in s_order) for r in s_rows
                }
                d_set = {
                    "\x1f".join(_norm_cell(r[i]) for i in d_order) for r in d_rows
                }
                for ln in list(s_set - d_set)[:3]:
                    print(f"      spark-only: {ln!r}")
                for ln in list(d_set - s_set)[:3]:
                    print(f"      duck-only : {ln!r}")
                ok = False
        if ok:
            print(f"OK    {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)

    print(f"\n{n_run - len(failures)}/{n_run} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
