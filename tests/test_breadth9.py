"""Unit tests for the round-5 operator families (suites/breadth9.py)
against planted fixtures and pure-Python references."""

from __future__ import annotations

import hashlib
import math

import pytest

from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.dedup import incremental_dedup_new
from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.retrieval import tfidf_top_terms
from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.sampling import (
    mixture_temperature_rates,
    shuffle_order_topk,
)
from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.similarity import (
    _jl_signs,
    int8_quantize_stats,
    random_projection,
)
from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.temporal import (
    funnel_stage_counts,
    hour_of_day_baseline,
)
from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.text import blocklist_stats


def test_mixture_temperature_weights(spark):
    rows = [("a",)] * 16 + [("b",)] * 4 + [("c",)] * 1
    df = spark.createDataFrame(rows, "source string")
    got = {r.source: r for r in
           mixture_temperature_rates(df, "source", alpha=0.5).collect()}
    z = 4.0 + 2.0 + 1.0  # sqrt(16) + sqrt(4) + sqrt(1)
    assert got["a"].n_docs == 16
    assert got["a"].weight == pytest.approx(4.0 / z, abs=1e-6)
    assert got["c"].weight == pytest.approx(1.0 / z, abs=1e-6)
    # alpha < 1 upweights small sources vs natural sampling
    assert got["c"].weight > 1.0 / 21.0
    assert sum(r.weight for r in got.values()) == pytest.approx(1.0, abs=1e-5)


def test_shuffle_order_topk_matches_python_md5(spark):
    ids = list(range(50))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = shuffle_order_topk(df, "doc_id", 10).collect()
    ref = sorted(ids, key=lambda i: (hashlib.md5(f"shuf{i}".encode()).hexdigest()[:8], i))[:10]
    assert [r.doc_id for r in sorted(got, key=lambda r: r.position)] == ref
    assert sorted(r.position for r in got) == list(range(1, 11))
    # deterministic across invocations
    again = shuffle_order_topk(df, "doc_id", 10).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_blocklist_token_not_substring(spark):
    df = spark.createDataFrame(
        [
            ("s1", "classy class ass"),   # only the bare token matches
            ("s1", "clean text here"),
            ("s2", "ass ass ass"),
            ("s2", ""),
        ],
        "source string, text string",
    )
    got = {r.source: r for r in
           blocklist_stats(df, "text", "source", ["ass"]).collect()}
    assert got["s1"].n_docs == 2
    assert got["s1"].n_blocked_docs == 1 and got["s1"].n_hits == 1
    assert got["s2"].n_blocked_docs == 1 and got["s2"].n_hits == 3


def test_incremental_dedup_new(spark):
    corpus = spark.createDataFrame(
        [(1, "Hello   World"), (2, "unique corpus doc")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "hello world"),        # dup of 1 after normalization
            (11, "brand new content"),
            (12, "brand new content"),  # batch-internal dup: kept (not this op's job)
        ],
        "doc_id long, text string",
    )
    got = {r.id for r in incremental_dedup_new(new, corpus).collect()}
    assert got == {11, 12}


def test_int8_quantize_matches_numpy(spark):
    import numpy as np

    vecs = [
        (1, [0.5, -1.0, 0.25, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector: scale 0, all-zero codes
        (3, [127.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = {r.id: r for r in int8_quantize_stats(df).collect()}
    for vid, v in vecs:
        a = np.asarray(v, dtype=np.float64)
        amax = np.abs(a).max()
        if amax == 0:
            q = np.zeros_like(a)
            scale = 0.0
        else:
            scale = amax / 127.0
            q = np.floor(a / scale + 0.5)
        assert got[vid].scale == pytest.approx(round(scale, 8), abs=1e-12)
        assert got[vid].q_sum == int(q.sum())
        assert got[vid].q_l2 == int((q * q).sum())
    # codes are int8-representable by construction
    assert got[3].q_sum == 127


def test_random_projection_matches_numpy(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = [(i, rng.normal(size=16).tolist()) for i in range(20)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = {r.id: r for r in
           random_projection(df, in_dims=16, out_dims=4).collect()}
    signs = np.asarray(_jl_signs(4, 16), dtype=np.float64)
    inv = 1.0 / math.sqrt(4.0)
    for vid, v in vecs:
        ref = signs @ np.asarray(v) * inv
        for j in range(4):
            assert got[vid][f"p{j}"] == pytest.approx(round(ref[j], 4), abs=1e-9)


def test_tfidf_top_terms_math(spark):
    df = spark.createDataFrame(
        [
            (1, "sA", "apple apple banana"),
            (2, "sA", "apple cherry"),
            (3, "sB", "banana banana banana"),
        ],
        "doc_id long, source string, text string",
    )
    got = tfidf_top_terms(df, k=2).collect()
    by_grp: dict[str, list] = {}
    for r in got:
        by_grp.setdefault(r.grp, []).append(r)
    # sA: apple tf=3 idf=ln(3/2); banana tf=1 idf=ln(3/2); cherry tf=1 idf=ln(3/1)
    sa = {r.term: r for r in by_grp["sA"]}
    assert set(sa) == {"apple", "cherry"}  # cherry's idf beats banana's
    assert sa["apple"].score == pytest.approx(round(3 * math.log(3 / 2), 4))
    assert sa["cherry"].score == pytest.approx(round(math.log(3 / 1), 4))
    sb = {r.term: r for r in by_grp["sB"]}
    assert sb["banana"].tf == 3


def test_funnel_stage_counts_strict_order(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, u, sec, typ):
        return (eid, t0 + dt.timedelta(seconds=sec), u, typ)

    rows = [
        # u1 completes the funnel in order
        ev(1, 1, 0, "view"), ev(2, 1, 10, "click"), ev(3, 1, 20, "purchase"),
        # u2 clicks BEFORE viewing -> stops at view stage
        ev(4, 2, 0, "click"), ev(5, 2, 10, "view"),
        # u3 views only
        ev(6, 3, 0, "view"),
        # u4 same-second click (not strictly later) -> stops at view
        ev(7, 4, 0, "view"), ev(8, 4, 0, "click"),
        # u5 never views: not in funnel at all
        ev(9, 5, 0, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {r.stage: r.n_users for r in
           funnel_stage_counts(df, ["view", "click", "purchase"]).collect()}
    assert got == {"view": 4, "click": 1, "purchase": 1}


def test_hour_of_day_baseline(spark):
    import datetime as dt

    rows = []
    eid = 0
    # type 'a': 2 events at 09:xx on two days, 1 event at 10:xx on one day
    for day, hour, n in [(1, 9, 2), (2, 9, 2), (1, 10, 1)]:
        for i in range(n):
            rows.append((eid, dt.datetime(2024, 1, day, hour, i), 1, "a"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {r.hod: r for r in hour_of_day_baseline(df).collect()}
    assert got[9].n_hours == 2 and got[9].avg_n == 2.0
    assert got[10].n_hours == 1 and got[10].avg_n == 1.0
    # type mean = 5 events / 3 hours; lift = avg / mean
    mean = 5.0 / 3.0
    assert got[9].lift == pytest.approx(round(2.0 / mean, 4))
    assert got[10].lift == pytest.approx(round(1.0 / mean, 4))
