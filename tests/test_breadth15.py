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
    # 4 lane-packed draws per md5, mirroring the operator
    block, lane = (rep - 1) // 4, (rep - 1) % 4
    d = _md5hex(f"boot:{block}:{key}")[8 * lane : 8 * lane + 8]
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


# --- Naive Bayes --------------------------------------------------------------


def test_naive_bayes_planted_separable(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.classifier import (
        naive_bayes_confusion,
    )

    rows = [
        (1, "alpha beta alpha", "en"),
        (2, "alpha beta beta", "en"),
        (3, "gamma delta gamma", "de"),
        (4, "delta gamma delta", "de"),
        (5, None, "en"),  # dropped
        (6, "alpha beta", None),  # dropped (no label)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {
        (r["lang"], r["predicted"]): r["n_docs"]
        for r in naive_bayes_confusion(df, "doc_id", "text", "lang").collect()
    }
    # fully-separated vocabularies -> a perfect diagonal
    assert out == {("en", "en"): 2, ("de", "de"): 2}


def test_naive_bayes_empty(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.classifier import (
        naive_bayes_confusion,
    )

    df = spark.createDataFrame([], "doc_id INT, text STRING, lang STRING")
    out = naive_bayes_confusion(df, "doc_id", "text", "lang")
    assert out.columns == ["lang", "predicted", "n_docs"]
    assert out.count() == 0


# --- Kaplan-Meier ----------------------------------------------------------------


def test_kaplan_meier_hand_curve(spark):
    from datetime import datetime

    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.survival import (
        kaplan_meier_time_to_event,
    )

    def ev(u, day, typ):
        return (u, datetime(2024, 1, 1 + day), typ)

    rows = [
        # u1: death at t=1
        ev(1, 0, "view"), ev(1, 1, "purchase"),
        # u2: death at t=2
        ev(2, 0, "view"), ev(2, 2, "purchase"),
        # u3: censored at t=2 (never purchases)
        ev(3, 0, "view"), ev(3, 2, "view"),
        # u4: death at t=3
        ev(4, 0, "view"), ev(4, 3, "purchase"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {
        r["t_days"]: r
        for r in kaplan_meier_time_to_event(df, "user_id", "ts").collect()
    }
    # KM by hand: t=1: n=4,d=1 -> S=0.75; t=2: n=3,d=1 -> 0.5 (censored
    # u3 leaves at t=2 too, still at risk AT t=2); t=3: n=1,d=1 -> 0.0
    assert set(out) == {1, 2, 3}
    assert (out[1]["n_at_risk"], out[1]["n_deaths"]) == (4, 1)
    assert out[1]["survival"] == 0.75
    assert (out[2]["n_at_risk"], out[2]["n_deaths"]) == (3, 1)
    assert out[2]["survival"] == 0.5
    assert (out[3]["n_at_risk"], out[3]["n_deaths"]) == (1, 1)
    assert out[3]["survival"] == 0.0


def test_kaplan_meier_monotone_on_events(spark, sf_dir):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.catalog import load_table
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.survival import (
        kaplan_meier_time_to_event,
    )

    ev = load_table(spark, sf_dir, "events")
    rows = sorted(
        kaplan_meier_time_to_event(ev, "user_id", "ts").collect(),
        key=lambda r: r["t_days"],
    )
    assert rows, "expected at least one death time on the fixture"
    # survival is a non-increasing step function in [0, 1]
    vals = [r["survival"] for r in rows]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    # at-risk counts strictly decrease across increasing t
    ns = [r["n_at_risk"] for r in rows]
    assert all(a > b for a, b in zip(ns, ns[1:]))


# --- out-of-fold target encoding ---------------------------------------------------


def test_target_encode_oof_exact(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.sampling import (
        kfold_group_assign,
        target_encode_oof,
    )

    rows = [(g, "A" if g < 20 else "B", float(g)) for g in range(30)]
    df = spark.createDataFrame(rows, ["g", "cat", "v"])
    out = target_encode_oof(df, "g", "cat", "v", k=3, salt="s")
    got = {(r["category"], r["fold"]): r for r in out.collect()}
    # engine-independent replication
    folds = {
        r["g"]: r["fold"]
        for r in kfold_group_assign(df, "g", k=3, salt="s").collect()
    }
    from collections import defaultdict

    cell_n, cell_s = defaultdict(int), defaultdict(float)
    for g, cat, v in rows:
        cell_n[(cat, folds[g])] += 1
        cell_s[(cat, folds[g])] += v
    for (cat, f), r in got.items():
        n_tot = sum(v for (c, _), v in cell_n.items() if c == cat)
        s_tot = sum(v for (c, _), v in cell_s.items() if c == cat)
        n_oof = n_tot - cell_n[(cat, f)]
        if n_oof:
            assert r["oof_mean"] == pytest.approx(
                round((s_tot - cell_s[(cat, f)]) / n_oof, 4), abs=2e-4
            )
        else:
            assert r["oof_mean"] is None
        assert r["n_rows"] == cell_n[(cat, f)]


def test_target_encode_oof_single_fold_category_is_null(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.sampling import (
        target_encode_oof,
    )

    # one group => one fold => no out-of-fold rows for its category
    df = spark.createDataFrame([(1, "solo", 5.0)], ["g", "cat", "v"])
    row = target_encode_oof(df, "g", "cat", "v", k=5).collect()[0]
    assert row["oof_mean"] is None


# --- GMM via EM ------------------------------------------------------------------


def test_gmm_recovers_planted_bimodal(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.mixture import (
        gmm_em_1d,
    )

    # two tight planted modes at 10 and 50, equal mass
    vals = [10.0 + 0.1 * (i % 5) for i in range(100)] + [
        50.0 + 0.1 * (i % 5) for i in range(100)
    ]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    rows = sorted(
        gmm_em_1d(df, "v", n_iter=2).collect(), key=lambda r: r["mu"]
    )
    assert len(rows) == 2
    # standardized units: after only 2 EM iterations from the wide
    # quartile init the means are pulled clearly apart toward the
    # planted modes (full convergence would put them at ~±1)
    assert rows[0]["mu"] < -0.4 and rows[1]["mu"] > 0.4
    assert rows[0]["weight"] == pytest.approx(0.5, abs=0.1)
    assert rows[1]["weight"] == pytest.approx(0.5, abs=0.1)
    assert rows[0]["n_soft"] == pytest.approx(100, abs=10)
    assert rows[1]["n_soft"] == pytest.approx(100, abs=10)
    # both components have shrunk well below the unit corpus variance
    assert all(r["sigma2"] < 0.8 for r in rows)


def test_gmm_constant_column_unit_variance_branch(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.mixture import (
        gmm_em_1d,
    )

    df = spark.createDataFrame([(7.0,)] * 50, ["v"])
    rows = gmm_em_1d(df, "v", n_iter=2).collect()
    # constant input: standardization takes the unit-scale branch and
    # both components collapse onto the single point without NaNs
    assert len(rows) == 2
    assert all(r["n_soft"] == r["n_soft"] for r in rows)  # no NaN
    assert sum(r["n_soft"] for r in rows) == pytest.approx(50, abs=0.1)


def test_gmm_empty(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.mixture import (
        gmm_em_1d,
    )

    df = spark.createDataFrame([], "v DOUBLE")
    out = gmm_em_1d(df, "v")
    assert out.columns == ["component", "weight", "mu", "sigma2", "n_soft"]
    assert out.count() == 0


# --- calibration bins ----------------------------------------------------------------


def test_calibration_bins_on_separable_data(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.classifier import (
        logreg_calibration_bins,
    )

    rows = [(1.0, 2.0 + 0.01 * i) for i in range(50)] + [
        (0.0, -2.0 - 0.01 * i) for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["y", "x"])
    out = logreg_calibration_bins(df, "y", ["x"], lr=2.0, n_steps=5).collect()
    assert sum(r["n_docs"] for r in out) == 100
    assert len(out) >= 2  # separable data spreads across bins
    for r in out:
        lo, hi = r["bin"] / 10.0, (r["bin"] + 1) / 10.0 if r["bin"] < 9 else 1.0
        assert lo <= r["mean_p"] <= hi + 1e-9
        assert 0.0 <= r["frac_pos"] <= 1.0
    # calibration direction: higher-p bins are purer in positives
    srt = sorted(out, key=lambda r: r["bin"])
    assert srt[0]["frac_pos"] <= srt[-1]["frac_pos"]


# --- feature hashing ---------------------------------------------------------------


def test_feature_hash_matches_python_replication(spark):
    from collections import defaultdict

    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.text import (
        feature_hash_buckets,
    )

    docs = [(1, "Alpha beta  gamma"), (2, "beta delta"), (3, None), (4, " ")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["bucket"]: (r["n_tokens"], r["signed_sum"])
        for r in feature_hash_buckets(df, "text", n_buckets=64).collect()
    }
    exp_n, exp_s = defaultdict(int), defaultdict(int)
    for w in ["alpha", "beta", "gamma", "beta", "delta"]:
        h = _md5hex(f"fh:{w}")
        b = int(h[:8], 16) % 64
        s = 1 - 2 * (int(h[8], 16) % 2)
        exp_n[b] += 1
        exp_s[b] += s
    assert got == {b: (exp_n[b], exp_s[b]) for b in exp_n}


# --- split-conformal intervals -----------------------------------------------------


def test_conformal_matches_python_replication(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.analytics import (
        split_conformal_coverage,
    )
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.sampling import (
        _hex_threshold,
    )

    rows = [(i, "g%d" % (i % 3), float(100 + (i * 13) % 40)) for i in range(300)]
    df = spark.createDataFrame(rows, ["id", "g", "v"])
    got = split_conformal_coverage(
        df, "id", "g", "v", train_frac=0.5, calib_frac=0.3, alpha=0.1,
        salt="conf",
    ).collect()[0]

    t1, t2 = _hex_threshold(0.5), _hex_threshold(0.8)
    split = {}
    for i, g, v in rows:
        d = _md5hex(f"conf:{i}")[:8]
        split[i] = "train" if d < t1 else ("calib" if d < t2 else "test")
    train = [(g, v) for i, g, v in rows if split[i] == "train"]
    model = {}
    for g in {g for g, _ in train}:
        vs = [v for gg, v in train if gg == g]
        model[g] = round(sum(vs) / len(vs), 4)
    cres = sorted(
        (round(abs(v - model[g]), 4), i)
        for i, g, v in rows
        if split[i] == "calib" and g in model
    )
    k = min(math.ceil(0.9 * (len(cres) + 1)), len(cres))
    q_hat = cres[k - 1][0]
    tres = [
        round(abs(v - model[g]), 4)
        for i, g, v in rows
        if split[i] == "test" and g in model
    ]
    cov = round(sum(1.0 for r in tres if r <= q_hat) / len(tres), 4)

    assert got["n_train"] == len(train)
    assert got["n_calib"] == len(cres)
    assert got["n_test"] == len(tres)
    assert got["q_hat"] == pytest.approx(q_hat, abs=2e-4)
    assert got["coverage"] == pytest.approx(cov, abs=2e-4)
    # the conformal guarantee: coverage >= 1 - alpha (up to test noise)
    assert got["coverage"] >= 0.8


def test_gmm_far_outlier_underflow_guard(spark):
    # one 1e9 outlier among 2000 unit values: after standardization
    # every component density underflows to exactly 0.0 for some rows
    # at the quartile init — the guarded responsibility must split
    # those rows evenly instead of producing 0/0 = NaN (which crashed
    # the driver-side rounding before the guard existed)
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.mixture import (
        gmm_em_1d,
    )

    vals = [(1.0,)] * 2000 + [(1e9,)]
    df = spark.createDataFrame(vals, ["v"])
    rows = gmm_em_1d(df, "v", n_iter=2).collect()
    assert len(rows) == 2
    for r in rows:
        for c in ("weight", "mu", "sigma2", "n_soft"):
            assert r[c] == r[c], f"NaN in {c}"  # NaN != NaN
    assert sum(r["n_soft"] for r in rows) == pytest.approx(2001, abs=0.1)


def test_auc_perfectly_separable_and_degenerate(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.classifier import (
        logreg_auc_roc,
    )

    # x perfectly separates y and p is monotone in x once w1 > 0, so
    # tie-aware AUC is exactly 1. Gentle lr on purpose: a hot lr
    # saturates the sigmoid and ROUND(p, 6) then TIES adjacent x
    # values across the class boundary (AUC 0.9 at lr=2/8 steps) —
    # the quantized-score semantics working as specified
    rows = [(1.0, float(v)) for v in range(6, 11)] + [
        (0.0, float(v)) for v in range(1, 6)
    ]
    df = spark.createDataFrame(rows, ["y", "x"])
    got = logreg_auc_roc(df, "y", ["x"], lr=0.5, n_steps=3).collect()
    assert len(got) == 1
    assert got[0]["n_pos"] == 5 and got[0]["n_neg"] == 5
    assert got[0]["auc"] == pytest.approx(1.0)

    # label-free scores (x constant): every row ties -> AUC 0.5
    const = spark.createDataFrame(
        [(1.0, 2.0)] * 4 + [(0.0, 2.0)] * 4, ["y", "x"]
    )
    got = logreg_auc_roc(const, "y", ["x"], lr=2.0, n_steps=3).collect()
    assert got[0]["auc"] == pytest.approx(0.5)

    # single-class input: AUC undefined -> NULL, counts still real
    pos_only = spark.createDataFrame([(1.0, float(v)) for v in range(5)], ["y", "x"])
    got = logreg_auc_roc(pos_only, "y", ["x"]).collect()
    assert got[0]["n_pos"] == 5 and got[0]["n_neg"] == 0
    assert got[0]["auc"] is None

    # empty input: empty frame, stable schema
    empty = spark.createDataFrame([], "y double, x double")
    out = logreg_auc_roc(empty, "y", ["x"])
    assert out.columns == ["n_pos", "n_neg", "auc"] and out.count() == 0


def test_auc_hand_computed_with_ties(spark):
    # hand case: scores will rank by x; y = [0,0,1,0,1,1] at
    # x = [1,1,2,2,3,3] -> per the tie-aware rank-sum:
    # hist: x=1 (0 pos, 2 neg), x=2 (1 pos, 1 neg), x=3 (2 pos, 1 neg... )
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.classifier import (
        logreg_auc_roc,
    )

    rows = [(0.0, 1.0), (0.0, 1.0), (1.0, 2.0), (0.0, 2.0), (1.0, 3.0), (1.0, 3.0)]
    df = spark.createDataFrame(rows, ["y", "x"])
    got = logreg_auc_roc(df, "y", ["x"], lr=2.0, n_steps=8).collect()[0]
    # U = pos(2)*(neg<2 + neg(2)/2) + pos(3)*(neg<3 + neg(3)/2)
    #   = 1*(2 + 0.5) + 2*(3 + 0)   = 8.5 ; P*N = 3*3 = 9
    assert got["auc"] == pytest.approx(8.5 / 9.0, abs=1e-6)


def test_decision_stump_hand_example(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.classifier import (
        decision_stump_binary,
    )

    # v in 1..10, y = 1 iff v >= 6; bucket_width=2 puts the clean cut
    # on the bucket-2/3 edge: threshold 6, pure sides, score 0
    rows = [(1.0 if v >= 6 else 0.0, float(v)) for v in range(1, 11)]
    df = spark.createDataFrame(rows, ["y", "v"])
    got = decision_stump_binary(df, "y", "v", bucket_width=2.0).collect()
    assert len(got) == 1
    r = got[0]
    assert r["threshold"] == pytest.approx(6.0)
    assert (r["n_left"], r["n_right"]) == (5, 5)
    assert (r["pos_left"], r["pos_right"]) == (0, 5)
    assert r["score"] == pytest.approx(0.0)

    # single non-empty bucket: no valid split -> empty result
    one = spark.createDataFrame([(1.0, 1.0), (0.0, 1.5)], ["y", "v"])
    assert decision_stump_binary(one, "y", "v", bucket_width=2.0).count() == 0

    # NULLs drop, not poison
    dirty = spark.createDataFrame(
        [(1.0, None), (None, 3.0)] + [(1.0 if v >= 6 else 0.0, float(v))
                                      for v in range(1, 11)],
        "y double, v double",
    )
    r2 = decision_stump_binary(dirty, "y", "v", bucket_width=2.0).collect()[0]
    assert r2["threshold"] == pytest.approx(6.0)


def test_auc_and_stump_partitioning_invariant(spark):
    # the argmin tie-breaks and LONG-arithmetic U statistic must make
    # both operators deterministic under any physical row layout —
    # shuffle the input across partition counts and demand identical
    # single-row outputs
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.classifier import (
        decision_stump_binary,
        logreg_auc_roc,
    )

    rows = [
        (1.0 if (v * 7) % 10 >= 5 else 0.0, float(v % 97), float(v))
        for v in range(1, 301)
    ]
    df = spark.createDataFrame(rows, ["y", "x", "v"])
    auc_ref = stump_ref = None
    for n_parts in (1, 7, 32):
        d = df.repartition(n_parts)
        a = tuple(logreg_auc_roc(d, "y", ["x"]).collect()[0])
        s = tuple(decision_stump_binary(d, "y", "v", 25.0).collect()[0])
        if auc_ref is None:
            auc_ref, stump_ref = a, s
        else:
            assert a == auc_ref, f"AUC varies with partitioning at {n_parts}"
            assert s == stump_ref, f"stump varies with partitioning at {n_parts}"


def test_isotonic_pav_hand_example(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.classifier import (
        isotonic_calibration_bins,
    )

    # two features separate partially; what matters here is the PAV
    # semantics on the resulting score histogram: fitted rates must be
    # non-decreasing in bin, pooled blocks must carry the exact
    # weighted average of their members, and total mass is preserved
    rows = [
        (1.0 if (v * 13) % 7 >= 3 else 0.0, float(v % 11), float(v % 5))
        for v in range(1, 201)
    ]
    df = spark.createDataFrame(rows, ["y", "a", "b"])
    out = isotonic_calibration_bins(
        df, "y", ["a", "b"], lr=2.0, n_steps=4, n_bins=50
    ).collect()
    assert out, "histogram came back empty"
    iso = [r["frac_pos_iso"] for r in sorted(out, key=lambda r: r["bin"])]
    assert iso == sorted(iso), "isotonic fit must be non-decreasing"
    n_total = sum(r["n_docs"] for r in out)
    assert n_total == 200
    # mass preservation: sum(n * iso) == sum(n * raw) == total positives
    pos = sum(r["n_docs"] * r["frac_pos_raw"] for r in out)
    pos_iso = sum(r["n_docs"] * r["frac_pos_iso"] for r in out)
    assert pos_iso == pytest.approx(pos, abs=0.01)

    # forced-violation micro case: rates [1.0, 0.0] over equal masses
    # MUST pool to 0.5 in both bins
    tiny = spark.createDataFrame(
        [(1.0, 0.0), (1.0, 0.0), (0.0, 1.0), (0.0, 1.0)], ["y", "x"]
    )
    got = {
        r["bin"]: r
        for r in isotonic_calibration_bins(
            tiny, "y", ["x"], lr=4.0, n_steps=4, n_bins=10
        ).collect()
    }
    rates = [got[b]["frac_pos_iso"] for b in sorted(got)]
    raw = [got[b]["frac_pos_raw"] for b in sorted(got)]
    if raw == sorted(raw):
        assert rates == raw  # already monotone: identity fit
    else:
        assert rates == [0.5, 0.5]  # the violating pair pools exactly

    # empty input: stable schema, zero rows
    empty = spark.createDataFrame([], "y double, x double")
    o = isotonic_calibration_bins(empty, "y", ["x"])
    assert o.columns == ["bin", "n_docs", "frac_pos_raw", "frac_pos_iso"]
    assert o.count() == 0


def test_isotonic_n_bins_range_guard(spark):
    """VERDICT r11 residual nit: a configurable n_bins must be
    range-guarded the way decision_stump_binary's bucket_width is —
    the driver collect is bounded BY n_bins and the oracle's minimax
    replay is O(n_bins²), so 10⁶ bins would silently turn the gate
    quadratic. Out-of-range values raise before any Spark job runs;
    in-range behavior (incl. the registered 1000-bin query) is
    unchanged — the oracle gate pins the hash."""
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.classifier import (
        isotonic_calibration_bins,
        logreg_calibration_bins,
    )

    df = spark.createDataFrame([(1.0, 0.5)], ["y", "x"])
    for bad in (0, -1, 10_001, 1_000_000):
        with pytest.raises(ValueError, match="n_bins"):
            isotonic_calibration_bins(df, "y", ["x"], n_bins=bad)
    with pytest.raises(ValueError, match="n_bins"):
        logreg_calibration_bins(df, "y", ["x"], n_bins=0)
    # boundary values are legal
    out = isotonic_calibration_bins(
        df, "y", ["x"], lr=1.0, n_steps=1, n_bins=1
    ).collect()
    assert len(out) == 1 and out[0]["bin"] == 0


def test_gd_persist_released_on_error(spark):
    """ADVICE r11 #1: if training/scoring raises after the feature
    frame is persisted, the cache must still be released — otherwise
    every failed invocation in a long-lived session leaks executor
    memory. Force a mid-operator failure via a feature column whose
    cast blows up at action time, then assert no new persistent RDD
    survives the raise."""
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.classifier import (
        logreg_auc_roc,
    )

    sc = spark.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    df = spark.createDataFrame([(1.0, 1.0)], ["y", "x"]).select(
        "y", F.raise_error(F.lit("boom")).cast("double").alias("x")
    )
    with pytest.raises(Exception, match="boom"):
        logreg_auc_roc(df, "y", ["x"])
    after = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    leaked = after - before
    assert not leaked, f"persisted RDDs leaked across a raise: {leaked}"
