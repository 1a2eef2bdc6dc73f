"""Unit + property tests for FastSS fuzzy matching
(operators/fuzzy.py): planted fixtures and a hypothesis check against
a pure-Python Levenshtein DP."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.fuzzy import fuzzy_neighbor_counts


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_neighbors_planted(spark):
    rows = [
        (1, "abc"),    # dist 1 of abd (sub), abcd (ins), ab (del)
        (2, "abd"),
        (3, "abcd"),
        (4, "ab"),
        (5, "xyz"),    # isolated
        (6, "abc"),    # exact duplicate of 1 -> dist 0
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {r["id"]: r["n_similar"] for r in
           fuzzy_neighbor_counts(df, "id", "name").collect()}
    exp = {}
    for i, a in rows:
        n = sum(1 for j, b in rows if j != i and _lev(a, b) <= 1)
        if n:
            exp[i] = n
    assert got == exp
    assert 5 not in got


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=0, max_size=5),
        min_size=1,
        max_size=12,
    )
)
def test_fuzzy_neighbors_match_dp_reference(spark, names):
    rows = list(enumerate(names))
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {r["id"]: r["n_similar"] for r in
           fuzzy_neighbor_counts(df, "id", "name").collect()}
    exp = {}
    for i, a in rows:
        n = sum(1 for j, b in rows if j != i and _lev(a, b) <= 1)
        if n:
            exp[i] = n
    assert got == exp


def test_fuzzy_rejects_unsupported_depth():
    with pytest.raises(NotImplementedError):
        fuzzy_neighbor_counts(None, "id", "name", max_distance=3)


def test_fuzzy_neighbors_k2_planted(spark):
    rows = [
        (1, "abc"),    # dist 2 of "a" (2 del), "abxy" (sub+ins), dist 1 of abd
        (2, "abd"),
        (3, "a"),
        (4, "abxy"),
        (5, "zzzzzz"),  # isolated at k=2
        (6, "abc"),     # exact duplicate of 1
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {r["id"]: r["n_similar"] for r in
           fuzzy_neighbor_counts(df, "id", "name", max_distance=2).collect()}
    exp = {}
    for i, a in rows:
        n = sum(1 for j, b in rows if j != i and _lev(a, b) <= 2)
        if n:
            exp[i] = n
    assert got == exp
    assert 5 not in got


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=0, max_size=6),
        min_size=1,
        max_size=12,
    )
)
def test_fuzzy_neighbors_k2_match_dp_reference(spark, names):
    """FastSS blocking losslessness at k=2 against the exact DP —
    low-entropy alphabet maximizes repeated-char variant collapse and
    empty/short-string edge cases."""
    rows = list(enumerate(names))
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {r["id"]: r["n_similar"] for r in
           fuzzy_neighbor_counts(df, "id", "name", max_distance=2).collect()}
    exp = {}
    for i, a in rows:
        n = sum(1 for j, b in rows if j != i and _lev(a, b) <= 2)
        if n:
            exp[i] = n
    assert got == exp
