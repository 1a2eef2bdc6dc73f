"""Generate a schema-compatible DEGENERATE test lake: a small sample
of sf0.001 plus pathological rows (empty/whitespace/duplicate text,
constant numeric columns, zero embedding vectors, duplicate keys).
Running the oracle-gate replica against it flushes cross-engine
divergences that well-behaved fixtures never exercise — the class of
bug the heaps_law_fit constant-variance flake belonged to. Usage:

    python tools/degenerate_data.py [out_dir]          # default /tmp/degenerate-sf
    python tools/check_oracle.py /tmp/degenerate-sf

NULL-heavy variants are deliberately NOT generated for key columns
(driver fixtures never null keys; nulling them tests a contract no
query promises), but text/value payloads do include empties and
duplicates. Pass ``--nulls`` to additionally null the PAYLOAD
columns (document text, event value/type, order price) on a few
rows — the crawler-reality tier.

A third tier is ALL-EMPTY tables (``LIMIT 0`` of every sf0.001
parquet — the empty-day-partition scenario); generate with a plain
duckdb COPY loop, see the commit history. Known UNFIXABLE divergence
on that tier: Spark emits ZERO rows for ROLLUP/CUBE/GROUPING SETS
over empty input while DuckDB (following the SQL standard) emits the
grand-total row of the empty grouping set — both the DataFrame API
and Spark SQL behave this way, so ``rollup_agg``, ``cube_agg``, and
``grouping_sets_agg`` legitimately report rows spark=0 duck=1 there.
Everything else is expected green on all three tiers.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.001"


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--nulls"]
    nulls = "--nulls" in sys.argv[1:]
    out = args[0] if args else ("/tmp/degenerate-sf-nulls" if nulls else "/tmp/degenerate-sf")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def sample(table: str, n: int, extra_sql: str = "") -> None:
        src = f"read_parquet('{SRC}/{table}.parquet')"
        q = f"SELECT * FROM (SELECT * FROM {src} ORDER BY 1 LIMIT {n})"
        if extra_sql:
            q = f"{q} UNION ALL SELECT * FROM ({extra_sql.format(src=src)})"
        con.execute(
            f"COPY ({q}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )

    # documents: empty text, whitespace-only, single token, an exact
    # triplicate, and a constant-token doc (constant-variance paths)
    sample(
        "documents",
        60,
        """
        SELECT * FROM (VALUES
          (900001, '', 'en', 'degenerate', 0),
          (900002, '   ', 'en', 'degenerate', 3),
          (900003, 'solo', 'en', 'degenerate', 4),
          (900004, 'dup dup dup dup dup dup dup dup', 'en', 'degenerate', 31),
          (900005, 'copy of this exact text appears three times', 'en', 'degenerate', 43),
          (900006, 'copy of this exact text appears three times', 'en', 'degenerate', 43),
          (900007, 'copy of this exact text appears three times', 'en', 'degenerate', 43)
        ) AS t(doc_id, text, lang, source, n_chars)
        """
        + (
            """
        UNION ALL SELECT * FROM (VALUES
          (900008, CAST(NULL AS VARCHAR), 'en', 'degenerate', 0),
          (900009, 'has null lang neighbor', CAST(NULL AS VARCHAR), 'degenerate', 22)
        ) AS t2(doc_id, text, lang, source, n_chars)
        """
            if nulls
            else ""
        ),
    )
    # embeddings: zero vector (norm 0), two identical vectors (cosine
    # tie), a constant-component vector
    null_vec = (
        "UNION ALL SELECT CAST(900003 AS BIGINT), "
        "CAST(NULL AS FLOAT[]), CAST(1 AS INTEGER)"
        if nulls
        else ""
    )
    con.execute(
        f"""
        COPY (
          SELECT * FROM (SELECT * FROM read_parquet('{SRC}/embeddings.parquet')
                         ORDER BY 1 LIMIT 40)
          UNION ALL
          SELECT * FROM (
            SELECT CAST(900001 AS BIGINT),
                   list_transform(range(len(embedding)), x -> CAST(0.0 AS FLOAT)),
                   CAST(0 AS INTEGER)
            FROM read_parquet('{SRC}/embeddings.parquet') LIMIT 1)
          UNION ALL
          SELECT * FROM (
            SELECT CAST(900002 AS BIGINT), embedding, label
            FROM read_parquet('{SRC}/embeddings.parquet')
            ORDER BY vec_id LIMIT 1)
          {null_vec}
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    # events: duplicate event at the same timestamp, constant value
    sample(
        "events",
        80,
        """
        SELECT * FROM (SELECT event_id + 900000, ts, user_id, event_type,
                              1.0, props
                       FROM {src} ORDER BY event_id LIMIT 5)
        """
        + (
            """
        UNION ALL
        SELECT * FROM (SELECT event_id + 910000, ts, user_id, event_type,
                              CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR)
                       FROM {src} ORDER BY event_id LIMIT 3)
        UNION ALL
        SELECT * FROM (SELECT event_id + 920000, ts, CAST(NULL AS BIGINT),
                              event_type, value, props
                       FROM {src} ORDER BY event_id LIMIT 2)
        UNION ALL
        SELECT * FROM (SELECT event_id + 930000, ts, user_id,
                              CAST(NULL AS VARCHAR), value, props
                       FROM {src} ORDER BY event_id LIMIT 2)
        """
            if nulls
            else ""
        ),
    )
    # lineitem/orders: a fully duplicated order (same items twice under
    # a new key), constant quantities
    sample(
        "lineitem",
        120,
        """
        SELECT l_orderkey + 900000, l_partkey, l_suppkey, l_linenumber,
               1.0, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM {src} ORDER BY l_orderkey, l_linenumber LIMIT 10
        """,
    )
    sample(
        "orders",
        60,
        """
        SELECT o_orderkey + 900000, o_custkey, o_orderstatus, 100.0,
               o_orderdate, o_orderpriority
        FROM {src} ORDER BY o_orderkey LIMIT 3
        """,
    )
    for t in ("customer", "supplier", "part", "nation", "region"):
        sample(t, 40)
    print(f"wrote degenerate lake to {out}")


if __name__ == "__main__":
    main()
