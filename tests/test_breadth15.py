"""Pins for the r10 ML-estimation batch (suites/breadth15.py):
seeded Lloyd k-means, full-batch-GD logistic regression, the
Poisson-bootstrap CI, next-token example construction, and group-
aware k-fold assignment. Each operator's cross-engine determinism
contract is replayed here in plain Python (hashlib md5 / manual
GD) so a drift in the Spark expression chain fails against an
engine-independent reference, not just against DuckDB."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.analytics import (
    poisson_bootstrap_mean_ci,
)
from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.classifier import (
    logreg_gd_train,
)
from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.clustering import (
    kmeans_lloyd_seeded,
)
from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.sampling import (
    kfold_group_assign,
)
from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.text import (
    next_token_examples,
)


def _md5hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _fold8(s: str) -> int:
    return int(_md5hex(s)[:8], 16)


# --- k-means -----------------------------------------------------------------


def test_kmeans_partitions_all_points(spark, sf_dir):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n_valid = emb.filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == 64)
    ).count()
    rows = kmeans_lloyd_seeded(emb, "vec_id", "embedding", k=8, n_iter=2).collect()
    assert 1 <= len(rows) <= 8
    assert sum(r["n_points"] for r in rows) == n_valid
    assert all(r["inertia"] >= 0.0 for r in rows)


def test_kmeans_planted_two_clusters(spark):
    # two tight blobs far apart -> Lloyd must separate them exactly
    dim = 64
    a = [[0.01 * i] + [0.0] * (dim - 1) for i in range(5)]
    b = [[10.0 + 0.01 * i] + [0.0] * (dim - 1) for i in range(5)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(a + b)], ["vec_id", "embedding"]
    )
    rows = kmeans_lloyd_seeded(df, "vec_id", "embedding", k=2, n_iter=2).collect()
    sizes = sorted(r["n_points"] for r in rows)
    assert sizes == [5, 5]
    # blobs are 0.04-wide, 10 apart: within-cluster d2 stays tiny
    assert all(r["inertia"] < 0.1 for r in rows)


def test_kmeans_codebook_budget_enforced(spark):
    df = spark.createDataFrame([(0, [0.0] * 64)], ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="codebook"):
        kmeans_lloyd_seeded(df, "vec_id", "embedding", k=1 + 65536 // 64)


def test_kmeans_empty_input_schema(spark):
    df = spark.createDataFrame([], "vec_id INT, embedding ARRAY<DOUBLE>")
    out = kmeans_lloyd_seeded(df, "vec_id", "embedding")
    assert out.columns == ["cluster_id", "n_points", "inertia"]
    assert out.count() == 0


# --- GD logistic regression ---------------------------------------------------


def _gd_reference(xy, lr=0.5, n_steps=3):
    """Plain-Python full-batch GD with SQL-ROUND(·,6) weight state."""

    def half_away6(q):
        p = abs(q) * 1e6
        fl = math.floor(p)
        r = (fl + 1 if p - fl >= 0.5 else fl) / 1e6
        return math.copysign(r, q)

    d = len(xy[0]) - 1
    w = [0.0] * (1 + d)
    for _ in range(n_steps):
        g = [0.0] * (1 + d)
        for row in xy:
            y, xs = row[0], row[1:]
            z = w[0]
            for j in range(d):
                z = z + w[j + 1] * xs[j]
            p = 1.0 / (1.0 + math.exp(-z))
            g[0] += p - y
            for j in range(d):
                g[j + 1] += (p - y) * xs[j]
        n = len(xy)
        w = [half_away6(w[j] - lr * (g[j] / n)) for j in range(1 + d)]
    return w


def test_logreg_gd_matches_python_reference(spark):
    # y depends on x1: positive class has larger x1
    xy = [
        (1.0, 2.0, 0.1),
        (1.0, 1.8, 0.2),
        (1.0, 2.2, 0.15),
        (0.0, 0.2, 0.3),
        (0.0, 0.4, 0.25),
        (0.0, 0.1, 0.05),
    ]
    df = spark.createDataFrame(xy, ["y", "a", "b"])
    row = logreg_gd_train(df, "y", ["a", "b"], lr=0.5, n_steps=3).collect()[0]
    ref = _gd_reference(xy)
    assert row["n_docs"] == 6
    assert row["w_bias"] == pytest.approx(ref[0], abs=2e-6)
    assert row["w_a"] == pytest.approx(ref[1], abs=2e-6)
    assert row["w_b"] == pytest.approx(ref[2], abs=2e-6)
    # accuracy of the sign rule under the reference weights
    correct = sum(
        1
        for r in xy
        if (ref[0] + ref[1] * r[1] + ref[2] * r[2] >= 0) == (r[0] == 1.0)
    )
    assert row["accuracy"] == pytest.approx(round(correct / len(xy), 4))


def test_logreg_gd_empty_input(spark):
    df = spark.createDataFrame([], "y DOUBLE, a DOUBLE")
    out = logreg_gd_train(df, "y", ["a"])
    assert out.columns == ["n_docs", "w_bias", "w_a", "accuracy"]
    assert out.count() == 0


# --- Poisson bootstrap ---------------------------------------------------------


def _poisson_weight(rep: int, key, cdf) -> int:
    d = _md5hex(f"boot:{rep}:{key}")[:8]
    for k, t in enumerate(cdf):
        if d < t:
            return k
    return 5


def test_bootstrap_matches_python_replication(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.sampling import (
        _hex_threshold,
    )

    vals = [(i, float(100 + (i * 37) % 50)) for i in range(200)]
    df = spark.createDataFrame(vals, ["k", "v"])
    row = poisson_bootstrap_mean_ci(df, "k", "v", n_reps=100).collect()[0]

    pmf, cum, cdf = math.exp(-1.0), 0.0, []
    for j in range(5):
        cum += pmf
        cdf.append(_hex_threshold(min(cum, 1.0)))
        pmf /= j + 1
    means = []
    for rep in range(1, 101):
        sw = swv = 0.0
        for k, v in vals:
            w = _poisson_weight(rep, k, cdf)
            sw += w
            swv += w * v
        if sw > 0:
            means.append((round(swv / sw, 4), rep))
    means.sort()
    assert row["n_reps"] == len(means)
    assert row["ci_lo"] == pytest.approx(means[2][0], abs=2e-4)
    assert row["ci_hi"] == pytest.approx(means[97][0], abs=2e-4)
    assert row["ci_lo"] <= row["mean"] <= row["ci_hi"]


# --- next-token examples --------------------------------------------------------


def test_next_token_examples_exact(spark):
    df = spark.createDataFrame(
        [(1, "A  b c d"), (2, "x y"), (3, None), (4, "p q r")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in next_token_examples(df, "doc_id", "text", ctx_len=2).collect()
    }
    # doc 1 normalizes to "a b c d": (a b -> c), (b c -> d)
    assert out[1]["n_examples"] == 2
    assert out[1]["n_unique_contexts"] == 2
    assert out[1]["example_checksum"] == _fold8("a b>c") + _fold8("b c>d")
    # doc 4: (p q -> r)
    assert out[4]["n_examples"] == 1
    assert out[4]["example_checksum"] == _fold8("p q>r")
    # too-short and NULL docs emit nothing
    assert 2 not in out and 3 not in out


# --- k-fold assignment -----------------------------------------------------------


def test_kfold_groups_never_straddle(spark):
    rows = [(u, i) for u in range(40) for i in range(3)]
    df = spark.createDataFrame(rows, ["user", "item"])
    out = kfold_group_assign(df, "user", k=5, salt="cv").collect()
    by_user: dict[int, set[int]] = {}
    for r in out:
        by_user.setdefault(r["user"], set()).add(r["fold"])
    assert all(len(folds) == 1 for folds in by_user.values())
    assert all(0 <= r["fold"] < 5 for r in out)
    # engine-independent replication of the fold draw
    for u in (0, 7, 39):
        expected = int(_md5hex(f"cv:{u}")[:8], 16) % 5
        assert by_user[u] == {expected}
