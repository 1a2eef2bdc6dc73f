"""Property-based invariants for the round-6 curation operators.

The load-bearing one: the histogram two-phase of token_budget_select
must select EXACTLY the docs (with exactly the cum_tokens) of the
naive single-global-order cumsum it replaces, for any quality/token
distribution — ties, boundary landings, single-bucket corpora,
budgets of every size.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.funnel import funnel_report
from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.sampling import (
    group_split,
    token_budget_select,
)

# docs: (quality from a coarse grid -> many exact ties, tokens incl. 0)
_DOCS = st.lists(
    st.tuples(
        st.sampled_from([0.0, 0.1, 0.1, 0.5, 0.5, 0.9, 1.0]),
        st.integers(0, 40),
    ),
    min_size=0,
    max_size=30,
)


@settings(max_examples=10, deadline=None)
@given(docs=_DOCS, budget=st.integers(0, 400))
def test_token_budget_two_phase_equals_naive_cumsum(spark, docs, budget):
    rows = [(i, q, nt) for i, (q, nt) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, q double, nt long") if rows else (
        spark.createDataFrame([], "doc_id long, q double, nt long")
    )
    got = {
        r["doc_id"]: r["cum_tokens"]
        for r in token_budget_select(
            df, F.col("q"), F.col("nt"), budget=budget, id_col="doc_id"
        ).collect()
    }
    # naive driver-side ground truth: global (q desc, id asc) cumsum
    cum, want = 0, {}
    for i, q, nt in sorted(rows, key=lambda r: (-round(r[1], 4), r[0])):
        cum += nt
        if cum <= budget:
            want[i] = cum
    assert got == want


_GRID = st.lists(st.integers(0, 200), min_size=0, max_size=40)


@settings(max_examples=8, deadline=None)
@given(keys=_GRID)
def test_group_split_partitions_and_respects_groups(spark, keys):
    rows = [(i, str(k % 7)) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "id long, grp string") if rows else (
        spark.createDataFrame([], "id long, grp string")
    )
    out = group_split(
        df, F.col("grp"), {"a": 0.4, "b": 0.35, "c": 0.25}
    ).collect()
    # partition: every row keeps exactly one split label
    assert len(out) == len(rows)
    assert all(r["split"] in ("a", "b", "c") for r in out)
    # group integrity: one label per group
    per_group = {}
    for r in out:
        per_group.setdefault(r["grp"], set()).add(r["split"])
    assert all(len(s) == 1 for s in per_group.values())


@settings(max_examples=8, deadline=None)
@given(vals=st.lists(st.integers(-50, 50), min_size=0, max_size=25))
def test_funnel_conservation(spark, vals):
    """sum(n_killed) + final n_out == total rows, and every stage's
    n_out feeds the next stage's n_in, for arbitrary kill patterns."""
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long") if rows else (
        spark.createDataFrame([], "id long, v long")
    )
    rules = [
        ("neg", F.col("v") < 0),
        ("big", F.col("v") > 25),
        ("even", F.col("v") % 2 == 0),
    ]
    rep = sorted(funnel_report(df, rules, "id").collect(), key=lambda r: r["stage"])
    assert rep[0]["n_in"] == len(rows)
    for prev, cur in zip(rep, rep[1:]):
        assert prev["n_out"] == cur["n_in"]
        assert prev["n_in"] - prev["n_killed"] == prev["n_out"]
    survivors = sum(
        1 for _, v in rows if not (v < 0 or v > 25 or v % 2 == 0)
    )
    assert rep[-1]["n_out"] == survivors


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)),
        min_size=0,
        max_size=40,
    ),
    k=st.integers(1, 5),
)
def test_bottom_k_tournament_equals_single_window(spark, rows, k):
    """The salted two-round tournament must select exactly the rows a
    single per-group rank window would, for any group sizes, ties
    (duplicate order values allowed), and k."""
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.sampling import (
        bottom_k_per_group,
    )

    data = [(g, v, i) for i, (g, v) in enumerate(rows)]  # i = unique tiebreak
    df = spark.createDataFrame(data, "g int, v int, i long") if data else (
        spark.createDataFrame([], "g int, v int, i long")
    )
    got = {
        (r["g"], r["v"], r["i"])
        for r in bottom_k_per_group(
            df, ["g"], [F.col("v"), F.col("i")], k,
            F.pmod(F.xxhash64(F.col("i")), F.lit(4)), n_salts=4,
        ).collect()
    }
    want = set()
    by_g: dict = {}
    for g, v, i in data:
        by_g.setdefault(g, []).append((v, i))
    for g, vs in by_g.items():
        for v, i in sorted(vs)[:k]:
            want.add((g, v, i))
    assert got == want
