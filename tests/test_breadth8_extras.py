"""Unit tests for the salted distinct-count pattern and the
pivot/unpivot round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.maintenance import (
    salted_distinct_count,
)
from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.pivot import pivot_sum


def test_salted_distinct_count_matches_plain(spark):
    # hot key 'a' with many repeated values; 'b' small
    rows = [("a", i % 37) for i in range(500)] + [("b", i) for i in range(5)]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {r["k"]: r["n_distinct"] for r in
           salted_distinct_count(df, "k", "v", salt_buckets=8).collect()}
    exp = {r["k"]: r["n"] for r in
           df.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()}
    assert got == exp == {"a": 37, "b": 5}


def test_salted_distinct_count_independent_of_buckets(spark):
    rows = [("k", f"u{i % 13}") for i in range(100)]
    df = spark.createDataFrame(rows, ["k", "v"])
    for b in (1, 4, 32):
        got = salted_distinct_count(df, "k", "v", salt_buckets=b).collect()
        assert got[0]["n_distinct"] == 13


def test_unpivot_inverts_pivot(spark):
    rows = [
        (1, "x", 10.0), (1, "x", 5.0), (1, "y", 2.0),
        (2, "y", 7.0),
    ]
    df = spark.createDataFrame(rows, ["id", "t", "v"])
    wide = pivot_sum(df, "id", "t", "v", values=["x", "y"], round_to=2)
    long = (
        wide.unpivot("id", ["x", "y"], "t", "total")
        .filter(F.col("total").isNotNull())
    )
    got = {(r["id"], r["t"]): r["total"] for r in long.collect()}
    # (2, 'x') never existed -> the pivot hole must NOT reappear
    assert got == {(1, "x"): 15.0, (1, "y"): 2.0, (2, "y"): 7.0}


def test_curation_v2_composition(spark, sf_dir):
    """The composed curation query only emits chunks for documents
    that survive every stage (smoke on real testdata: survivors <=
    corpus, chunks reference surviving docs only)."""
    from bootcamp_stackacademy_datalake_minio_airflow_spark.suites.breadth8 import (
        q_curation_chunks_v2,
    )
    from bootcamp_stackacademy_datalake_minio_airflow_spark.catalog import load_table

    chunks = q_curation_chunks_v2(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    surviving = chunks.select("doc_id").distinct().count()
    assert 0 < surviving < n_docs  # p75 cutoff must drop ~25% of scored docs
    # chunk doc_ids are a subset of the corpus
    orphan = chunks.join(docs.select("doc_id"), "doc_id", "left_anti").count()
    assert orphan == 0


def test_char_stats_hand_computed(spark):
    import math

    df = spark.createDataFrame([(1, "aab1 "), (2, "")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in __import__(
        "bootcamp_stackacademy_datalake_minio_airflow_spark.operators.text", fromlist=["char_stats"]
    ).char_stats(df).collect()}
    # "aab1 ": a:2 b:1 1:1 ' ':1, n=5
    ps = [2 / 5, 1 / 5, 1 / 5, 1 / 5]
    exp = round(-sum(p * math.log(p) for p in ps), 4)
    assert out[1]["char_entropy"] == exp
    assert out[1]["digit_ratio"] == 0.2 and out[1]["space_ratio"] == 0.2
    # empty text: no chars -> NULL entropy and NULL ratios
    assert out[2]["char_entropy"] is None and out[2]["digit_ratio"] is None


def test_no_rowwise_python_udfs_in_plans():
    """Anti-pattern regression pin: no registered query may compile to
    a row-at-a-time Python UDF (BatchEvalPython). Arrow-batched
    MapInPandas/ArrowEvalPython nodes are the sanctioned slow path
    (multimodal decode, packing) and are allowed. Scans the PLANS.md
    artifact, which tools/explain_all.py regenerates per round."""
    import pathlib

    plans = pathlib.Path(__file__).resolve().parent.parent / "PLANS.md"
    text = plans.read_text()
    assert "BatchEvalPython" not in text
    assert "## vendas_flagship" in text  # artifact sanity


def test_basket_rules_hand_example(spark, sf_dir):
    """Association-rule math sanity on real testdata: every rule's
    confidence is in (0, 1], lift > 0, and confidence = n_both /
    antecedent support recomputed independently."""
    from bootcamp_stackacademy_datalake_minio_airflow_spark.suites.breadth8 import (
        q_basket_association_rules,
    )
    from bootcamp_stackacademy_datalake_minio_airflow_spark.catalog import load_table
    from pyspark.sql import functions as F

    rules = q_basket_association_rules(spark, sf_dir).collect()
    assert rules and all(0 < r["confidence"] <= 1 and r["lift"] > 0 for r in rules)
    li = load_table(spark, sf_dir, "lineitem")
    supp = {
        r["l_partkey"]: r["c"]
        for r in li.select("l_orderkey", "l_partkey").distinct()
        .groupBy("l_partkey").agg(F.count("*").alias("c")).collect()
    }
    for r in rules[:5]:
        # tolerance, not equality: Spark rounds HALF_UP, Python's
        # round() half-to-even — they split on exact .xxxx5 ratios
        assert abs(r["confidence"] - r["n_both"] / supp[r["ante"]]) <= 1e-4


def test_transition_matrix_rows_are_stochastic(spark, sf_dir):
    """Per-from_type probabilities must sum to 1 (within rounding)."""
    from bootcamp_stackacademy_datalake_minio_airflow_spark.suites.breadth8 import (
        q_event_transition_matrix,
    )
    from pyspark.sql import functions as F

    out = q_event_transition_matrix(spark, sf_dir)
    sums = out.groupBy("from_type").agg(F.sum("p").alias("s")).collect()
    assert sums and all(abs(r["s"] - 1.0) < 1e-2 for r in sums)


def test_expectation_report_single_pass_and_null_semantics(spark):
    """Violations count correctly, NULL predicate results are
    violations, and the whole report is ONE aggregation (no Exchange
    per expectation)."""
    from bootcamp_stackacademy_datalake_minio_airflow_spark.functions.quality import (
        expectation_report,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None)], ["id", "v"]
    )
    got = {r["expectation"]: r for r in expectation_report(
        df, {"v_positive": F.col("v") > 0, "id_known": F.col("id").isNotNull()}
    ).collect()}
    # v > 0 is NULL for row 3 -> violation; -5 -> violation
    assert got["v_positive"]["n_violations"] == 2
    assert got["v_positive"]["n_passing"] == 1
    assert got["id_known"]["n_violations"] == 0
    assert all(r["n_rows"] == 3 for r in got.values())
    plan = expectation_report(
        df, {"a": F.col("v") > 0, "b": F.col("v") < 100}
    )._jdf.queryExecution().executedPlan().toString()
    # single-partition local input -> the two expectations must not
    # introduce more than the one final aggregation exchange
    assert plan.count("Exchange") <= 1


def test_expectation_report_edge_cases(spark):
    """Empty input -> 0 violations (vacuously passing), dotted names
    survive, empty contract -> empty report (review findings)."""
    from bootcamp_stackacademy_datalake_minio_airflow_spark.functions.quality import (
        expectation_report,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, 2.0)], ["id", "v"]).filter(F.lit(False))
    got = expectation_report(df, {"price.non_negative": F.col("v") >= 0}).collect()
    assert [(r["expectation"], r["n_rows"], r["n_violations"], r["n_passing"])
            for r in got] == [("price.non_negative", 0, 0, 0)]
    empty = expectation_report(df, {})
    assert empty.columns == ["expectation", "n_rows", "n_violations", "n_passing"]
    assert empty.count() == 0


def test_winsorize_clamps_to_band(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.maintenance import winsorize

    rows = [(i, float(i)) for i in range(1, 101)] + [(200, 10_000.0), (201, None)]
    df = spark.createDataFrame(rows, ["id", "v"])
    out = {r["id"]: r["v_winsorized"] for r in
           winsorize(df, "v", lower_q=0.05, upper_q=0.95).collect()}
    lo = min(x for x in out.values() if x is not None)
    hi = max(x for x in out.values() if x is not None)
    assert out[200] == hi and hi < 10_000.0  # outlier clamped
    assert out[50] == 50.0                   # interior untouched
    assert out[201] is None                  # NULL passes through
    assert lo >= 1.0


def test_impute_group_mean_semantics(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.maintenance import (
        impute_group_mean,
    )

    rows = [
        ("a", 10.0), ("a", 20.0), ("a", None),
        ("b", None), ("b", None),   # all-NULL group stays NULL
        ("c", 7.0),
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = [(r["g"], r["v"], r["v_imputed"]) for r in
           impute_group_mean(df, "v", "g").orderBy("g", "v").collect()]
    assert ("a", None, 15.0) in got
    assert ("b", None, None) in got
    assert ("c", 7.0, 7.0) in got


def test_basket_rules_apriori_prune_long_tail(spark, tmp_path):
    """A-priori prune (VERDICT r10 ask #4): on a long-tail lake —
    where most items sit below min_support and the sf0.1 lake's
    uniform supports never go — the pruned and unpruned plans must
    produce identical rules, and the adaptive path must agree with
    both. Tail: 200 items in exactly one basket each; head: 6 items
    co-occurring across 12 baskets."""
    from bootcamp_stackacademy_datalake_minio_airflow_spark.suites.breadth8 import _basket_rules

    rows = []
    for b in range(12):  # head baskets: rotating 4-of-6 popular items
        for j in range(4):
            rows.append((b, 100 + (b + j) % 6))
    for t in range(200):  # tail: each item once, one per basket
        rows.append((1000 + t, 10_000 + t))
    df = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    lake = tmp_path / "lineitem.parquet"
    df.write.parquet(str(lake))

    def run(prune):
        out = _basket_rules(spark, str(tmp_path), min_support=3, prune=prune)
        return sorted(tuple(r) for r in out.collect())

    pruned, unpruned, auto = run(True), run(False), run(None)
    assert pruned, "long-tail lake produced no rules (fixture broke)"
    assert pruned == unpruned == auto
    # the fixture really has a tail for the prune to cut
    supp = df.distinct().groupBy("l_partkey").count().collect()
    assert sum(1 for r in supp if r["count"] < 3) == 200
