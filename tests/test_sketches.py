"""Count-min sketch invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.sketches import (
    cms_build,
    cms_estimate,
)


def test_cms_never_undercounts_and_is_mergeable(spark):
    vals = (
        ["apple"] * 50 + ["banana"] * 20 + ["cherry"] * 5 + ["durian"]
        + [f"noise{i}" for i in range(200)]
    )
    df = spark.createDataFrame([(v,) for v in vals], "token string")
    cells = cms_build(df, "token", depth=4, width=64).cache()
    qs = spark.createDataFrame(
        [("apple",), ("banana",), ("cherry",), ("durian",), ("absent",)],
        "token string",
    )
    est = {
        r.token: r.cms_est
        for r in cms_estimate(cells, qs, "token", depth=4, width=64).collect()
    }
    true = {"apple": 50, "banana": 20, "cherry": 5, "durian": 1, "absent": 0}
    for t, n in true.items():
        assert est[t] >= n  # one-sided error
        assert est[t] <= n + len(vals)  # sane upper bound
    # total cell mass per row == stream length (mergeable sums)
    per_row = {
        r.i: r.s
        for r in cells.groupBy("i").agg(F.sum("cnt").alias("s")).collect()
    }
    assert set(per_row) == {0, 1, 2, 3}
    assert all(s == len(vals) for s in per_row.values())

    # mergeability: sketch(A ++ B) == cellwise sum of sketch(A), sketch(B)
    a, b = vals[:100], vals[100:]
    ca = cms_build(
        spark.createDataFrame([(v,) for v in a], "token string"), "token", 4, 64
    )
    cb = cms_build(
        spark.createDataFrame([(v,) for v in b], "token string"), "token", 4, 64
    )
    merged = {
        (r.i, r.h): r.cnt
        for r in ca.unionByName(cb)
        .groupBy("i", "h")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    whole = {(r.i, r.h): r.cnt for r in cells.collect()}
    assert merged == whole
    cells.unpersist()


def test_hll_accuracy_and_max_merge(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    n = 5000
    df = spark.range(n).select(F.concat(F.lit("user"), F.col("id")).alias("u"))
    est = hll_estimate(hll_registers(df, "u", p=8), p=8).collect()[0].hll_est
    # p=8 -> sigma ~ 1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert abs(est - n) / n < 0.2
    # duplicates must not inflate the estimate (max is idempotent)
    dup = df.unionByName(df).unionByName(df)
    est_dup = hll_estimate(hll_registers(dup, "u", p=8), p=8).collect()[0].hll_est
    assert est_dup == est
    # max-merge: registers(A ++ B) == bucketwise max of the parts
    a = spark.range(0, 2500).select(F.concat(F.lit("user"), F.col("id")).alias("u"))
    b = spark.range(2500, n).select(F.concat(F.lit("user"), F.col("id")).alias("u"))
    ra, rb = hll_registers(a, "u"), hll_registers(b, "u")
    merged = (
        ra.unionByName(rb)
        .groupBy("bucket")
        .agg(F.max("rho_max").alias("rho_max"))
    )
    assert {
        (r.bucket, r.rho_max) for r in merged.collect()
    } == {(r.bucket, r.rho_max) for r in hll_registers(df, "u").collect()}


def test_kmv_exact_on_small_sets_and_estimates_overlap(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.sketches import (
        kmv_pair_jaccard,
        kmv_sketches,
    )

    # groups smaller than k: the sketch IS the set -> estimate exact
    rows = (
        [("A", f"x{i}") for i in range(10)]
        + [("B", f"x{i}") for i in range(5)]   # B subset of A: J = 5/10
        + [("C", f"y{i}") for i in range(10)]  # disjoint from A,B
    )
    df = spark.createDataFrame(rows, "src string, v string")
    sk = kmv_sketches(df, "src", "v", k=32)
    est = {
        (r.src_a, r.src_b): r.kmv_jaccard
        for r in kmv_pair_jaccard(sk, "src", k=32).collect()
    }
    assert est[("A", "B")] == 0.5
    assert est[("A", "C")] == 0.0 and est[("B", "C")] == 0.0

    # large overlapping sets, k << n: estimate within a loose bound
    big = (
        [("P", f"e{i}") for i in range(2000)]
        + [("Q", f"e{i}") for i in range(1000, 3000)]  # J = 1000/3000
    )
    bsk = kmv_sketches(
        spark.createDataFrame(big, "src string, v string"), "src", "v", k=64
    )
    j = kmv_pair_jaccard(bsk, "src", k=64).collect()[0].kmv_jaccard
    assert abs(j - 1 / 3) < 0.15  # sigma ~ sqrt(J(1-J)/k) ~ 0.06


def test_cms_weighted_build_cell_identical(spark):
    """cms_build_weighted over (value, count) must produce exactly the
    cells cms_build produces over the raw stream — the linearity claim
    the heavy-hitters query's |vocab|-vs-|stream| hashing cut rests
    on. Includes multiplicities >= 1 and an adversarially small width
    so cells collide."""
    import random

    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.sketches import (
        cms_build,
        cms_build_weighted,
    )
    from pyspark.sql import functions as F

    rng = random.Random(11)
    stream = []
    for i in range(40):
        stream.extend([f"tok{i}"] * rng.randint(1, 9))
    raw = spark.createDataFrame([(t,) for t in stream], "v string")
    counts = raw.groupBy("v").agg(F.count("*").alias("c"))
    a = {
        (r.i, r.h): r.cnt
        for r in cms_build(raw, "v", depth=3, width=8).collect()
    }
    b = {
        (r.i, r.h): r.cnt
        for r in cms_build_weighted(counts, "v", "c", depth=3, width=8).collect()
    }
    assert a == b


def test_datacard_sketch_tolerance_vs_exact_card(spark):
    """VERDICT r7 ask #3: the sketch data card must TRACK the exact
    card, not just hash-match its own oracle. At sf0.1: HLL p=8 has
    ~6.5% standard error on large cardinalities and sits in the exact
    linear-counting regime on small ones; the 10% hash-sampled median
    of a 60k-doc lake is tight. Exact columns (n_docs/n_tokens/
    blank_ratio) must be IDENTICAL — they share no sketch."""
    from bootcamp_stackacademy_datalake_minio_airflow_spark.queries import queries

    qs = queries()
    sf = "/root/testdata/sf0.1"
    exact = qs["corpus_datacard"](spark, sf).collect()[0]
    sk = qs["corpus_datacard_sketch"](spark, sf).collect()[0]

    assert sk.n_docs == exact.n_docs
    assert sk.n_tokens == exact.n_tokens
    assert sk.blank_ratio == exact.blank_ratio
    # small cardinalities: linear-counting regime, near-exact (3-sigma
    # at these magnitudes is < 1, but allow 20% for the estimate form)
    assert abs(sk.n_langs_hll - exact.n_langs) <= max(2, 0.2 * exact.n_langs)
    assert abs(sk.n_sources_hll - exact.n_sources) <= max(
        2, 0.2 * exact.n_sources
    )
    # dup ratio: both in [~0, 1]; the HLL arm estimates the distinct
    # count within ~3*6.5% at this cardinality -> absolute band
    assert abs(sk.dup_ratio_hll - exact.exact_dup_ratio) <= 0.05
    # sampled median within 15% of the exact median
    assert abs(sk.p50_tokens_est - exact.p50_tokens) <= 0.15 * max(
        1.0, exact.p50_tokens
    )
