"""Machine-pin of the one known cross-engine divergence (VERDICT r9
ask #3, carried as prose since r5): over EMPTY input, Spark emits
ZERO rows for ROLLUP / CUBE / GROUPING SETS (both the DataFrame API
and Spark SQL), while DuckDB — following the SQL standard — emits the
grand-total row of the empty grouping set. The close-out's "191/194
on the all-empty lake, nothing new" claim was previously a prose
inventory; this pins (a) the exact family membership (any FOURTH
query using a grouping-sets construct must show up here before it can
silently widen the known-delta count) and (b) the exact delta shape
per query (spark=0 rows; duck=1 grand-total row with NULL keys, NULL
aggregate sums, and COUNT(*)=0)."""

from __future__ import annotations

import re

import duckdb
import pytest

import __spark_entry__ as ep

#: the complete set of registry queries built on a grouping-sets
#: construct — the only queries allowed to diverge on empty input
GROUPING_FAMILY = {"rollup_agg", "cube_agg", "grouping_sets_agg"}

_CONSTRUCT = re.compile(r"\b(ROLLUP|CUBE|GROUPING\s+SETS)\s*\(", re.IGNORECASE)

SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


@pytest.fixture(scope="module")
def empty_lake(tmp_path_factory) -> str:
    """All-empty lake: LIMIT 0 of every sf0.001 parquet — the
    empty-day-partition scenario (schema preserved, zero rows)."""
    out = tmp_path_factory.mktemp("empty-lake")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet') LIMIT 0) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(out)


def test_grouping_family_inventory_is_exactly_three():
    """Any new oracle using ROLLUP/CUBE/GROUPING SETS must be added to
    GROUPING_FAMILY *and* to the delta pins below — otherwise the
    all-empty sweep's expected-delta count widens silently."""
    family = {n for n, sql in ep.oracle_sql().items() if _CONSTRUCT.search(sql)}
    assert family == GROUPING_FAMILY, (
        f"grouping-sets family changed: {sorted(family ^ GROUPING_FAMILY)}"
    )


@pytest.mark.parametrize("name", sorted(GROUPING_FAMILY))
def test_empty_input_delta_shape(spark, empty_lake, name):
    # Spark side: the documented engine behavior — zero rows. A
    # change here (e.g. a Spark upgrade adopting the standard
    # grand-total row) flips the expected delta and must fail loudly.
    sdf = ep.queries()[name](spark, empty_lake)
    assert sdf.count() == 0, f"{name}: Spark grew rows on empty input"

    # DuckDB side: exactly ONE row — the empty grouping set's grand
    # total: NULL group keys, NULL aggregate sums, COUNT(*) = 0.
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{empty_lake}/{t}.parquet')"
        )
    rows = con.execute(ep.oracle_sql()[name]).fetchall()
    cols = [d[0] for d in con.description]
    con.close()
    assert len(rows) == 1, f"{name}: oracle delta is no longer 1 row"
    row = dict(zip(cols, rows[0]))
    expected = {
        "rollup_agg": {
            "l_returnflag": None,
            "l_linestatus": None,
            "sum_qty": None,
            "n": 0,
        },
        "cube_agg": {
            "o_orderstatus": None,
            "o_orderpriority": None,
            "n": 0,
            "total": None,
        },
        "grouping_sets_agg": {
            "l_returnflag": None,
            "l_linestatus": None,
            "receita": None,
            "n": 0,
        },
    }[name]
    assert row == expected, f"{name}: grand-total row shape changed: {row}"
