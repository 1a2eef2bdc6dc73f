"""Property-based tests (hypothesis) for the analytics operators:
invariants that must hold for ANY input — skyline vs the O(n^2)
dominance definition, classification-report count identities, Gini
bounds, PSI symmetry. Examples are capped low (every example spins
Spark jobs)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.analytics import (
    classification_report,
    key_skew_profile,
    pareto_front_2d,
    population_stability_index,
)

_POINTS = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)),
    min_size=1,
    max_size=25,
)


def _brute_pareto(points):
    return sorted(
        a
        for a in points
        if not any(
            (b[0] <= a[0] and b[1] >= a[1]) and (b[0] < a[0] or b[1] > a[1])
            for b in points
        )
    )


@settings(max_examples=12, deadline=None)
@given(_POINTS)
def test_pareto_equals_dominance_definition(spark, pts):
    df = spark.createDataFrame(
        [(float(c), g) for c, g in pts], ["cost", "gain"]
    )
    got = sorted(
        (int(r["cost"]), r["gain"])
        for r in pareto_front_2d(df, "cost", "gain").collect()
    )
    assert got == _brute_pareto(pts)


_LABELS = st.lists(
    st.tuples(st.sampled_from("abc"), st.sampled_from("abcd")),
    min_size=1,
    max_size=30,
)


@settings(max_examples=10, deadline=None)
@given(_LABELS)
def test_classification_report_count_identities(spark, pairs):
    df = spark.createDataFrame(pairs, ["gold", "pred"])
    rows = classification_report(df, "gold", "pred").collect()
    n = len(pairs)
    # supports and predictions each partition the corpus
    assert sum(r["n_gold"] for r in rows) == n
    assert sum(r["n_pred"] for r in rows) == n
    # tp never exceeds either margin; micro-P == micro-R == accuracy
    for r in rows:
        assert r["tp"] <= min(r["n_gold"], r["n_pred"]) or r["n_gold"] == 0
    total_tp = sum(r["tp"] for r in rows)
    assert total_tp == sum(1 for g, p in pairs if g == p)


_KEYS = st.lists(st.integers(0, 6), min_size=1, max_size=40)


@settings(max_examples=10, deadline=None)
@given(_KEYS)
def test_gini_bounds_and_totals(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    r = key_skew_profile(df, "k").collect()[0]
    assert r["n_rows"] == len(keys)
    assert r["n_keys"] == len(set(keys))
    # Gini of counts lies in [0, 1); exactly 0 iff all counts equal
    assert -1e-9 <= r["gini"] < 1.0
    counts = sorted(
        sum(1 for x in keys if x == k) for k in set(keys)
    )
    if len(set(counts)) == 1:
        assert abs(r["gini"]) < 1e-9
    assert r["max_n"] == counts[-1]


_VALS = st.lists(
    st.tuples(st.integers(0, 950), st.booleans()), min_size=2, max_size=40
)


@settings(max_examples=10, deadline=None)
@given(_VALS)
def test_psi_contribs_finite_and_swap_antisymmetric(spark, rows):
    # force both cohorts non-empty
    rows = rows + [(10, True), (20, False)]
    df = spark.createDataFrame(
        [(i, float(v), a) for i, (v, a) in enumerate(rows)],
        ["id", "val", "is_a"],
    )
    out = population_stability_index(df, "val", F.col("is_a")).collect()
    swapped = population_stability_index(df, "val", ~F.col("is_a")).collect()
    for r in out:
        assert r["contrib"] is not None  # smoothing keeps ln defined
        assert r["contrib"] >= -1e-9  # (pa-pb)ln(pa/pb) is never negative
    # swapping cohorts transposes the shares but preserves PSI
    psi = sum(r["contrib"] for r in out)
    psi_sw = sum(r["contrib"] for r in swapped)
    assert abs(psi - psi_sw) < 1e-6
    a = {r["bucket"]: (r["pa"], r["pb"]) for r in out}
    b = {r["bucket"]: (r["pb"], r["pa"]) for r in swapped}
    assert a == b
