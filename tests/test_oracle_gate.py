"""Meta-tests of the correctness gate itself (tools/check_oracle.py):
the value-hash canonicalizer must DETECT divergence -- a gate that
can't fail proves nothing."""

from __future__ import annotations

import importlib.util
import sys

spec = importlib.util.spec_from_file_location("check_oracle", "tools/check_oracle.py")


def _load():
    import os

    sys.path.insert(0, os.getcwd())
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_value_hash_detects_differences_and_normalizes_equivalences():
    co = _load()
    vh, nc = co.value_hash, co._norm_cell

    rows_a = [(1, "x", 1.5), (2, "y", 2.5)]
    rows_b = [(2, "y", 2.5), (1, "x", 1.5)]   # same multiset, other order
    rows_c = [(1, "x", 1.5), (2, "y", 2.6)]   # one value differs
    order = [0, 1, 2]
    assert vh(rows_a, order) == vh(rows_b, order), "row order must not matter"
    assert vh(rows_a, order) != vh(rows_c, order), "a changed value must differ"
    # column reordering via col_order maps identical data to one hash
    swapped = [(r[2], r[0], r[1]) for r in rows_a]
    assert vh(rows_a, [0, 1, 2]) == vh(swapped, [1, 2, 0])

    # cell normalization: NaN == NULL (both engines disagree on NaN
    # semantics), bools as ints, floats via %.6g so engine formatting
    # (1.0 vs 1) can't split a hash
    assert nc(float("nan")) == nc(None)
    assert nc(True) == "1" and nc(False) == "0"
    assert nc(1.0) == nc(1.0000000001)  # %.6g collapses
    assert nc(1.0) != nc(1.001)
    # int 1 and float 1.0 normalize to the same string ('1')
    assert nc(1) == nc(1.0)


def test_value_hash_sensitive_to_duplicates_and_nulls():
    co = _load()
    vh = co.value_hash
    order = [0]
    assert vh([(1,), (1,)], order) != vh([(1,)], order), "multiset, not set"
    assert vh([(None,)], order) != vh([(0,)], order)
    assert vh([("",)], order) != vh([(None,)], order)


def test_priority_window_guard():
    """VERDICT r4 ask #3: the 50-slot driver window is hand-maintained;
    a typo'd rotation would silently sort a family out of the window
    with no failure. Pin: exactly 50 entries, every name resolves in
    the registry, no duplicates, and the registry iteration order
    actually starts with the priority block."""
    from bootcamp_stackacademy_datalake_minio_airflow_spark import queries as q

    names = list(q.queries())
    assert len(q.PRIORITY) == 50
    assert len(set(q.PRIORITY)) == 50, "duplicate name in PRIORITY"
    dangling = [n for n in q.PRIORITY if n not in names]
    assert not dangling, f"PRIORITY names missing from registry: {dangling}"
    assert names[:50] == q.PRIORITY, "registry prefix != PRIORITY"
    # every in-window query must be hash-gated (oracle-bearing): a
    # rows-only query in the window wastes a hard-gate slot
    oracles = q.oracle_sql()
    rows_only = [n for n in q.PRIORITY if n not in oracles]
    assert not rows_only, f"rows-only queries occupy window slots: {rows_only}"
    # r9 rotation block (VERDICT r8 ask #1, ">=14"): every non-parity
    # slot is a rotation slot this round — the 43-slot tail must hold
    # never-driver-checked families (the documented 23-name r9 queue,
    # the 8 r7-registered families, breadth families, and four TPC-H
    # variants). A mis-merge that reverted the rotation would re-check
    # r8's families instead. Pin the parity prefix + block head/tail
    # rather than all 43 names (the full list lives in queries.py).
    parity = [
        "vendas_flagship",
        "projection",
        "pivot_sum_payments",
        "left_join_null_fill",
        "timestamp_to_date",
        "string_normalize",
        "union_all_sources",
    ]
    assert q.PRIORITY[:7] == parity, "parity queries must head the window"


def _latest_green_rounds() -> dict[str, int]:
    """name -> most recent DRIVER-GREEN round (rows+schema+hash match,
    no error) across every CORRECTNESS_r*.json artifact from a round
    BEFORE queries.CURRENT_ROUND. Self-maintaining glob (ADVICE r9 #1:
    a hard-coded r0[1-8] pattern silently weakened every round) and
    keyed on GREEN rows, not any rows (VERDICT r9 wrong #1: the two r1
    stragglers carried non-green r1 rows, which a has-a-row key would
    have blocked from re-entering the window forever)."""
    import json
    import pathlib
    import re

    from bootcamp_stackacademy_datalake_minio_airflow_spark import queries as q

    latest: dict[str, int] = {}
    for p in pathlib.Path(".").glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name)
        if not m or int(m.group(1)) >= q.CURRENT_ROUND:
            continue
        rnd = int(m.group(1))
        for name, row in json.loads(p.read_text()).items():
            green = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            )
            if green:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def test_rotation_follows_staleness_policy():
    """Steady-state rotation cadence (VERDICT r9 asks #1+#2): the 43
    non-parity window slots must be exactly the output of the
    oldest-green-first policy — sort every non-parity family on
    (latest driver-green round, name) ascending, take the first 43.
    Never-green families sort as round 0, so verification debt is
    always consumed before any re-check; once debt is zero, the
    stalest evidence (r1-era green rows earned against a long-gone
    tree) is re-verified first. Hand-editing PRIORITY to anything
    else fails here with the exact expected block."""
    from bootcamp_stackacademy_datalake_minio_airflow_spark import queries as q

    latest = _latest_green_rounds()
    if not latest:  # no artifacts in cwd (e.g. run outside repo root)
        import pytest

        pytest.skip("no CORRECTNESS_r*.json artifacts visible")
    parity = set(q.PRIORITY[:7])
    pool = [n for n in q.queries() if n not in parity]
    expected = sorted(pool, key=lambda n: (latest.get(n, 0), n))[:43]
    assert q.PRIORITY[7:] == expected, (
        "rotation block violates oldest-green-first policy; expected "
        f"{expected}"
    )


def test_staleness_dashboard_consistent():
    """VERDICT r11 ask #8: COVERAGE.md carries a machine-generated
    evidence-freshness table (family -> last driver-green round).
    Regenerate it from the artifacts and fail on drift, and
    cross-check the tool's green-round map against this test file's
    independent implementation so the dashboard and the rotation
    policy can never disagree."""
    import pathlib
    import sys

    repo = pathlib.Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo / "tools"))
    import staleness_table as st

    tool_latest = st.latest_green_rounds(repo)
    if not tool_latest:
        import pytest

        pytest.skip("no CORRECTNESS_r*.json artifacts visible")
    assert tool_latest == _latest_green_rounds(), (
        "tool and rotation policy disagree on latest-green rounds"
    )
    text = (repo / "COVERAGE.md").read_text()
    assert st.BEGIN in text and st.END in text, (
        "COVERAGE.md is missing the staleness block — run "
        "python tools/staleness_table.py --write"
    )
    committed = text.split(st.BEGIN, 1)[1].split(st.END, 1)[0]
    expected = st.render(repo).split(st.BEGIN, 1)[1].split(st.END, 1)[0]
    assert committed == expected, (
        "COVERAGE.md staleness block is stale — re-run "
        "python tools/staleness_table.py --write"
    )
