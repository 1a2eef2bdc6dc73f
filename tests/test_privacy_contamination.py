"""Privacy (PII redaction), contamination, and repetition-signal
operators on planted fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.contamination import (
    decontaminate,
    ngram_contamination,
)
from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.privacy import pii_count, redact
from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.text import repetition_signals


def test_redact_all_kinds(spark):
    df = spark.createDataFrame(
        [
            (1, "write to alice.smith+x@corp.example.com or call 555-0199 now"),
            (2, "server at 192.168.0.17 responded"),
            (3, "nothing sensitive here"),
            (4, "Contact John.Doe@Example.COM about it"),  # mixed case
        ],
        ["id", "text"],
    )
    out = df.select(
        "id",
        redact("text").alias("red"),
        pii_count("text", "email").alias("ne"),
        pii_count("text", "phone").alias("np"),
        pii_count("text", "ipv4").alias("ni"),
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["red"] == "write to <EMAIL> or call <PHONE> now"
    assert (by_id[1]["ne"], by_id[1]["np"]) == (1, 1)
    assert by_id[2]["red"] == "server at <IP> responded"
    assert by_id[2]["ni"] == 1
    assert by_id[3]["red"] == "nothing sensitive here"
    assert (by_id[3]["ne"], by_id[3]["np"], by_id[3]["ni"]) == (0, 0, 0)
    assert by_id[4]["red"] == "Contact <EMAIL> about it"
    assert by_id[4]["ne"] == 1


def test_contamination_and_decontaminate(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            # full 6-token overlap -> 4 shared 3-grams
            (1, "alpha beta gamma delta epsilon zeta"),
            # one shared 3-gram (alpha beta gamma)
            (2, "alpha beta gamma nine ten eleven"),
            # clean
            (3, "one two three four five six"),
        ],
        ["doc_id", "text"],
    )
    hits = {
        r["doc_id"]: r["n_shared_grams"]
        for r in ngram_contamination(corpus, bench, n=3).collect()
    }
    assert hits == {1: 4, 2: 1}
    kept = decontaminate(corpus, bench, n=3).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in kept) == [3]


def test_contamination_short_doc_whole_gram(spark):
    # docs shorter than n contribute one whole-text gram
    bench = spark.createDataFrame([(9, "tiny doc")], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [(1, "tiny doc"), (2, "other text")], ["doc_id", "text"]
    )
    hits = ngram_contamination(corpus, bench, n=8).collect()
    assert [(r["doc_id"], r["n_shared_grams"]) for r in hits] == [(1, 1)]


def test_repetition_signals(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),  # bigram "spam spam" x3 of 3
            (2, "one two three four"),  # all bigrams unique
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert out[1]["distinct_token_ratio"] == 0.25
    assert out[1]["top_bigram_frac"] == 1.0
    assert out[1]["mean_token_len"] == 4.0
    assert out[2]["distinct_token_ratio"] == 1.0
    assert abs(out[2]["top_bigram_frac"] - 0.3333) < 1e-9


def test_pii_map_only_plan(spark):
    # redaction must stay a map-only projection: no exchange in the plan
    df = spark.createDataFrame([(1, "a b c")], ["id", "text"])
    plan = (
        df.select(redact("text").alias("r"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_dp_noisy_counts_mechanism(spark):
    """Noise is Laplace-shaped and deterministic: same input ->
    identical release; noisy_n deviates from true_n but stays within
    a generous Laplace tail bound for eps=1 (|noise| < 15 w.p.
    ~1-3e-7 per group)."""
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.privacy import dp_noisy_counts

    rows = [(f"s{i % 6}",) for i in range(600)]
    df = spark.createDataFrame(rows, ["source"])
    a = {r["source"]: r for r in dp_noisy_counts(df, "source", include_true=True).collect()}
    b = {r["source"]: r for r in dp_noisy_counts(df, "source", include_true=True).collect()}
    assert a.keys() == b.keys() and all(
        a[s]["noisy_n"] == b[s]["noisy_n"] for s in a
    )
    for s, r in a.items():
        assert r["true_n"] == 100
        assert r["noisy_n"] != r["true_n"]  # noise actually applied
        assert abs(r["noisy_n"] - r["true_n"]) < 15
    # epsilon scales the noise down
    tight = {r["source"]: r for r in dp_noisy_counts(df, "source", epsilon=100.0, include_true=True).collect()}
    assert all(abs(tight[s]["noisy_n"] - 100) <= abs(a[s]["noisy_n"] - 100) for s in a)


def test_k_anonymity_violations(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.privacy import (
        k_anonymity_violations,
    )

    rows = (
        [("US", "A")] * 10        # safe
        + [("US", "B")] * 3       # violating
        + [("DE", "A")] * 1       # violating
        + [(None, "B")] * 2       # NULL quasi-combo is still a group
    )
    df = spark.createDataFrame(rows, ["country", "segment"])
    got = {(r["country"], r["segment"]): r["group_n"]
           for r in k_anonymity_violations(df, ["country", "segment"], k=5).collect()}
    assert got == {("US", "B"): 3, ("DE", "A"): 1, (None, "B"): 2}


def test_dp_release_schema_omits_true_count_and_handles_null_key(spark):
    """Default release schema must NOT carry the exact count (that
    would make epsilon infinite), and a NULL group key still gets a
    usable noisy count instead of leaking (NULL noise + exact n)."""
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.privacy import dp_noisy_counts

    df = spark.createDataFrame(
        [("a",)] * 10 + [(None,)] * 7, ["source"]
    )
    out = dp_noisy_counts(df, "source")
    assert out.columns == ["source", "noisy_n"]
    rows = {r["source"]: r["noisy_n"] for r in out.collect()}
    assert set(rows) == {"a", None}
    assert rows[None] is not None and rows[None] != 7
