"""Property-based tests (hypothesis) for the round-4 additions:
triangle counting vs a brute-force reference, chunking coverage
invariants, phrase positions vs a pure-Python scan, and salted
distinct counting vs the plain aggregate — for ANY input, not just
planted fixtures. Example counts are low: every example runs Spark
jobs.
"""

from __future__ import annotations

import itertools

from hypothesis import given, settings, strategies as st

from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.graph import triangle_counts
from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.maintenance import (
    salted_distinct_count,
)
from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.retrieval import (
    chunk_tokens,
    phrase_positions,
)

_EDGES = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=0,
    max_size=30,
)


def _ref_triangles(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    counts: dict[int, int] = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= und:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


@settings(max_examples=12, deadline=None)
@given(_EDGES, st.sampled_from([5_000_000, 0]))
def test_triangle_counts_matches_bruteforce(spark, edges, budget):
    # budget 0 exercises the wedge-join scale path, the default the
    # broadcast-intersection fast path — both must match brute force
    if not edges:
        return
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(df, broadcast_edge_budget=budget).collect()
    }
    assert got == _ref_triangles(edges)


_WORDS = st.lists(
    st.sampled_from(["a", "b", "c", "value", "table", "part"]),
    min_size=1,
    max_size=30,
)


@settings(max_examples=12, deadline=None)
@given(_WORDS)
def test_phrase_positions_matches_python_scan(spark, words):
    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    phrase = ["value", "table", "part"]
    expected = [
        i
        for i in range(len(words) - 2)
        if words[i : i + 3] == phrase
    ]
    rows = phrase_positions(df, phrase).collect()
    if not expected:
        assert rows == []
    else:
        assert len(rows) == 1
        assert rows[0]["n_matches"] == len(expected)
        assert rows[0]["first_pos"] == expected[0]


@settings(max_examples=10, deadline=None)
@given(st.integers(1, 90), st.integers(1, 40), st.integers(1, 40))
def test_chunk_tokens_cover_all_tokens_exactly(spark, n_tok, window, stride):
    if stride > window:
        # contract: rejected loudly (tokens would go uncovered)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            chunk_tokens(None, window=window, stride=stride)
        return
    text = " ".join(f"t{i}" for i in range(n_tok))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        chunk_tokens(df, window=window, stride=stride).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # invariants: starts are 0, stride, ...; every chunk is non-empty,
    # bounded by window, and the final chunk reaches the last token
    assert [r["start_tok"] for r in rows] == list(range(0, n_tok, stride))
    assert all(1 <= r["chunk_len"] <= window for r in rows)
    last = rows[-1]
    assert last["start_tok"] + last["chunk_len"] == n_tok
    assert all(r["first_token"] == f"t{r['start_tok']}" for r in rows)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["x", "y"]), st.integers(0, 20)),
        min_size=1,
        max_size=60,
    ),
    st.sampled_from([1, 3, 16]),
)
def test_salted_distinct_equals_plain(spark, rows, buckets):
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {r["k"]: r["n_distinct"] for r in
           salted_distinct_count(df, "k", "v", salt_buckets=buckets).collect()}
    exp = {}
    for k, v in rows:
        exp.setdefault(k, set()).add(v)
    assert got == {k: len(vs) for k, vs in exp.items()}


_DOCS = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d", "spark"]), min_size=1, max_size=8),
    min_size=1,
    max_size=8,
)


@settings(max_examples=10, deadline=None)
@given(_DOCS)
def test_bm25_matches_python_reference(spark, docs):
    import math

    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.retrieval import bm25_topk

    terms, k1, b = ["a", "spark"], 1.2, 0.75
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["score"] for r in bm25_topk(df, terms, k=100).collect()}

    n = float(len(docs))
    avgdl = sum(len(ws) for ws in docs) / n
    dfreq = {t: sum(1 for ws in docs if t in ws) for t in terms}
    exp = {}
    for i, ws in enumerate(docs):
        s = 0.0
        for t in terms:
            tf = ws.count(t)
            if not tf:
                continue
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ws) / avgdl))
        if s:
            exp[i] = round(s, 4)
    assert set(got) == set(exp)
    for i in exp:
        assert abs(got[i] - exp[i]) <= 1e-4


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 100_000), st.integers(-50, 50)),
        min_size=1,
        max_size=30,
    )
)
def test_ewma_matches_python_reference(spark, rows):
    import datetime as dt
    import math

    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.temporal import (
        ewma_user_scores,
    )

    t0 = dt.datetime(2024, 1, 1)
    data = [
        (u, t0 + dt.timedelta(seconds=s), float(v)) for u, s, v in rows
    ]
    df = spark.createDataFrame(data, ["user_id", "ts", "value"])
    got = {r["user_id"]: r for r in ewma_user_scores(df).collect()}

    ref = max(s for _, s, _ in rows)
    exp: dict[int, float] = {}
    cnt: dict[int, int] = {}
    for u, s, v in rows:
        exp[u] = exp.get(u, 0.0) + v * math.exp(-(ref - s) / 86400.0)
        cnt[u] = cnt.get(u, 0) + 1
    assert set(got) == set(exp)
    for u in exp:
        assert got[u]["n_events"] == cnt[u]
        assert abs(got[u]["ewma_score"] - round(exp[u], 4)) <= 1e-3
