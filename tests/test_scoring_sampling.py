"""Unit tests for weighted reservoir sampling (Efraimidis–Spirakis),
EWMA time-decay scoring, and per-source length outliers."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pytest
from pyspark.sql import functions as F

from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.sampling import (
    weighted_reservoir_topn,
)
from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.temporal import ewma_user_scores
from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.text import length_outliers


def _es_key(doc_id: int, weight: float, salt: str = "wrs") -> float:
    h = hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()[:8]
    u = (int(h, 16) + 1.0) / 16**8
    return math.log(u) / weight


def test_weighted_reservoir_matches_reference_impl(spark):
    rows = [(i, 10 * (i % 7 + 1)) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = weighted_reservoir_topn(df, "w", 20).collect()
    exp = sorted(
        ((_es_key(i, w), i, w) for i, w in rows), key=lambda t: (-t[0], t[1])
    )[:20]
    assert [(r["doc_id"], r["weight"]) for r in got] == [(i, w) for _, i, w in exp]
    for r, (k, _, _) in zip(got, exp):
        assert r["sample_key"] == pytest.approx(round(k, 4), abs=1e-9)


def test_weighted_reservoir_excludes_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, -5), (3, 10)], ["doc_id", "w"]
    )
    got = weighted_reservoir_topn(df, "w", 10).collect()
    assert [r["doc_id"] for r in got] == [3]


def test_weighted_reservoir_heavy_rows_win_more(spark):
    # one row 1000x heavier than 99 light rows: it lands in the top-10
    # with probability ~1 under ES sampling; deterministically check
    # OUR fixed draw includes it
    rows = [(0, 100000)] + [(i, 1) for i in range(1, 100)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = {r["doc_id"] for r in weighted_reservoir_topn(df, "w", 10).collect()}
    assert 0 in got


def test_weighted_reservoir_plan_is_top_n(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(50)], ["doc_id", "w"])
    plan = (
        weighted_reservoir_topn(df, "w", 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan  # partial top-n, no full sort


def test_ewma_scores_hand_computed(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 10.0),
        (1, t0 + dt.timedelta(days=1), 20.0),  # newest -> ref
        (2, t0 + dt.timedelta(hours=12), 5.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = {r["user_id"]: r for r in ewma_user_scores(df).collect()}
    exp1 = round(10.0 * math.exp(-1.0) + 20.0, 4)  # 1 day old + fresh
    exp2 = round(5.0 * math.exp(-0.5), 4)
    assert out[1]["n_events"] == 2 and out[1]["ewma_score"] == pytest.approx(exp1)
    assert out[2]["n_events"] == 1 and out[2]["ewma_score"] == pytest.approx(exp2)


def test_length_outliers_flags_only_extremes(spark):
    # source A: nine 10-token docs + one 100-token doc -> the long one
    # is the only |z| > 2 outlier; source B uniform -> sigma=0, no rows
    rows = []
    for i in range(9):
        rows.append((i, "a " * 10, "A"))
    rows.append((9, "a " * 100, "A"))
    for i in range(10, 15):
        rows.append((i, "b " * 7, "B"))
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = length_outliers(df, z_cutoff=2.0).collect()
    assert [(r["doc_id"], r["source"], r["n_tok"]) for r in got] == [(9, "A", 100)]
    ns = [10] * 9 + [100]
    mu = sum(ns) / 10
    sigma = math.sqrt(sum((n - mu) ** 2 for n in ns) / 10)
    assert got[0]["z_score"] == pytest.approx(round((100 - mu) / sigma, 4))
