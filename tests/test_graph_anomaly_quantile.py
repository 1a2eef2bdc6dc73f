"""Unit tests for triangle counting, event-rate anomaly detection,
and hash-sampled quantile estimation."""

from __future__ import annotations

import datetime as dt

import pytest

from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.graph import triangle_counts
from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.sketches import sampled_quantiles
from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.temporal import rate_anomalies


def test_triangle_counts_k4_plus_tail_both_regimes(spark):
    # K4 on {1,2,3,4}: 4 triangles, each node in exactly 3;
    # node 5 hangs off node 4 -> in no triangle, emits no row.
    # budget=0 forces the wedge-join scale path, which must agree
    # with the default broadcast-intersection path (review finding:
    # the scale branch previously had zero coverage)
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges = spark.createDataFrame(k4 + [(4, 5)], ["src", "dst"])
    for budget in (5_000_000, 0):
        got = {
            r["node"]: r["n_triangles"]
            for r in triangle_counts(
                edges, broadcast_edge_budget=budget
            ).collect()
        }
        assert got == {1: 3, 2: 3, 3: 3, 4: 3}, budget


def test_triangle_counts_tolerates_duplicates_and_direction(spark):
    # triangle 1-2-3 given with mixed directions and repeats
    rows = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (3, 1)]
    edges = spark.createDataFrame(rows, ["src", "dst"])
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_counts_no_triangles(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    assert triangle_counts(edges).count() == 0


def test_rate_anomalies_flags_planted_spike(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # type 'a': 5 events/hour for 30 hours, except hour 28 has 50
    for h in range(30):
        n = 50 if h == 28 else 5
        # vary one hour inside the lookback so sigma > 0
        if h == 10:
            n = 6
        for i in range(n):
            rows.append(("a", t0 + dt.timedelta(hours=h, seconds=i)))
    df = spark.createDataFrame(rows, ["event_type", "ts"])
    got = rate_anomalies(df, lookback=24, z_cutoff=2.5).collect()
    assert [(r["event_type"], r["hour_ts"], r["n_events"]) for r in got] == [
        ("a", t0 + dt.timedelta(hours=28), 50)
    ]
    assert got[0]["z_score"] > 2.5


def test_rate_anomalies_requires_full_window(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # only 10 hours of history, then a spike: window never fills -> no alarm
    for h in range(10):
        for i in range(5 if h != 3 else 6):
            rows.append(("a", t0 + dt.timedelta(hours=h, seconds=i)))
    for i in range(500):
        rows.append(("a", t0 + dt.timedelta(hours=10, seconds=i)))
    df = spark.createDataFrame(rows, ["event_type", "ts"])
    assert rate_anomalies(df, lookback=24, z_cutoff=2.5).count() == 0


def test_sampled_quantiles_exact_and_error_columns(spark):
    rows = [(i, float(i)) for i in range(1, 1001)]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {r["q"]: r for r in sampled_quantiles(
        df, "v", "k", fraction=0.2, quantiles=(0.5, 0.9)
    ).collect()}
    assert set(got) == {0.5, 0.9}
    # exact quantiles of 1..1000
    assert got[0.5]["exact"] == pytest.approx(500.5)
    assert got[0.9]["exact"] == pytest.approx(900.1)
    for r in got.values():
        assert r["rel_err"] == pytest.approx(
            round(abs(r["est"] - r["exact"]) / r["exact"], 4), abs=1e-3
        )
        assert r["rel_err"] < 0.15  # 20% sample of a uniform stays close


def test_sampled_quantiles_full_fraction_is_exact(spark):
    rows = [(i, float(i * 3)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, ["k", "v"])
    for r in sampled_quantiles(df, "v", "k", fraction=1.0).collect():
        assert r["est"] == r["exact"] and r["rel_err"] == 0.0


def test_rate_anomalies_zero_hours_deflate_baseline(spark):
    """Sparse series: events only every 6th hour. With hour
    densification the trailing-24h window holds mostly zeros, so a
    modest burst IS an anomaly; a rows-window over non-empty hours
    would have compared it against same-sized bursts and stayed
    silent (review finding)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(0, 144, 6):  # 24 sparse hours over 6 days, 5 events each
        for i in range(5):
            rows.append(("a", t0 + dt.timedelta(hours=h, seconds=i)))
    # hour 150: a burst of 8 — above any non-zero hour ever seen
    for i in range(8):
        rows.append(("a", t0 + dt.timedelta(hours=150, seconds=i)))
    df = spark.createDataFrame(rows, ["event_type", "ts"])
    got = rate_anomalies(df, lookback=24, z_cutoff=2.5).collect()
    assert (t0 + dt.timedelta(hours=150)) in [r["hour_ts"] for r in got]


def test_debounce_collapses_chained_bursts(spark):
    """A machine-gun burst spanning longer than the quiet period still
    collapses to ONE survivor (gap chaining), and a gap >= quiet
    starts a new burst."""
    import datetime as dt

    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.temporal import (
        debounce_events,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # burst: events every 100s for 1000s (chained: every gap < 300)
    for i in range(11):
        rows.append((i, 1, "click", t0 + dt.timedelta(seconds=100 * i)))
    # then silence of 400s -> new burst of 2
    rows.append((20, 1, "click", t0 + dt.timedelta(seconds=1400)))
    rows.append((21, 1, "click", t0 + dt.timedelta(seconds=1450)))
    # different key unaffected
    rows.append((30, 2, "click", t0 + dt.timedelta(seconds=50)))
    df = spark.createDataFrame(rows, ["event_id", "user_id", "event_type", "ts"])
    kept = sorted(
        r["event_id"]
        for r in debounce_events(df, quiet_seconds=300).collect()
    )
    assert kept == [0, 20, 30]


def test_debounce_preserves_caller_gap_column(spark):
    import datetime as dt

    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.temporal import (
        debounce_events,
    )

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, 1, "click", t0, 99), (2, 1, "click", t0 + dt.timedelta(seconds=500), 42)],
        ["event_id", "user_id", "event_type", "ts", "__gap"],
    )
    out = debounce_events(df, quiet_seconds=300)
    assert "__gap" in out.columns
    assert sorted(r["__gap"] for r in out.collect()) == [42, 99]
