"""Property-based tests (hypothesis): invariants that must hold for
ANY input, not just the planted fixtures.

Examples are capped low — every example spins Spark jobs, so these
buy breadth-per-example, not volume.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

_EDGES = st.lists(
    st.tuples(st.integers(0, 25), st.integers(0, 25)),  # self-loops allowed
    min_size=0,
    max_size=40,
)


def _reference_components(edges):
    """Driver-side union-find ground truth (independent of the
    implementation under test's own union-find fast path)."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for u, v in edges:
        nodes.update((u, v))
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = sorted((ru, rv))
            parent[hi] = lo
    # min-label per component
    comps: dict[int, int] = {}
    for n in nodes:
        root = find(n)
        comps[root] = min(comps.get(root, n), n)
    return {n: comps[find(n)] for n in nodes}


@settings(max_examples=8, deadline=None)
@given(edges=_EDGES)
def test_connected_components_paths_agree(spark, edges):
    """The driver union-find fast path and the distributed min-label
    propagation must label every random graph identically — and match
    an independent reference."""
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.dedup import (
        connected_components,
    )

    if not edges:
        return
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a long, id_b long"
    )
    via_driver = {
        r.node: r.component for r in connected_components(pairs).collect()
    }
    via_distributed = {
        r.node: r.component
        # max_iter must cover the worst-case diameter (a 26-node path);
        # the loop exits early at the fixpoint anyway
        for r in connected_components(
            pairs, driver_budget_edges=0, max_iter=30
        ).collect()
    }
    assert via_driver == via_distributed == _reference_components(edges)


@settings(max_examples=6, deadline=None)
@given(
    w_train=st.integers(1, 8),
    w_val=st.integers(1, 8),
    w_test=st.integers(1, 8),
)
def test_hash_split_partition_and_stability(spark, w_train, w_val, w_test):
    """Splits partition the keyspace (every row exactly one label) and
    verdicts are per-key stable when the corpus grows."""
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.sampling import hash_split

    total = w_train + w_val + w_test
    weights = {
        "train": w_train / total,
        "val": w_val / total,
        "test": w_test / total,
    }
    df = spark.range(500).withColumnRenamed("id", "k")
    out = hash_split(df, "k", weights)
    assert out.count() == 500
    assert out.filter(~F.col("split").isin("train", "val", "test")).count() == 0
    small = {(r.k, r.split) for r in out.collect()}
    bigger = hash_split(spark.range(800).withColumnRenamed("id", "k"), "k", weights)
    big = {(r.k, r.split) for r in bigger.collect() if r.k < 500}
    assert small == big


def test_connected_components_string_ids(spark):
    """Node ids need not be numeric: the driver fast path must
    preserve the caller's id type (min-label = lexicographic min for
    strings, same as the distributed path's F.min)."""
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [("doc_b", "doc_a"), ("doc_b", "doc_c"), ("x9", "x2")],
        "id_a string, id_b string",
    )
    got = {r.node: r.component for r in connected_components(pairs).collect()}
    assert got == {
        "doc_a": "doc_a",
        "doc_b": "doc_a",
        "doc_c": "doc_a",
        "x2": "x2",
        "x9": "x2",
    }
    dist = {
        r.node: r.component
        for r in connected_components(pairs, driver_budget_edges=0).collect()
    }
    assert dist == got
