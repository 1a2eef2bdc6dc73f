"""Deterministic sampling/split/quota operators and web-corpus
cleaning (extension; the reference pipeline has no sampling — full
tables only)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bootcamp_stackacademy_datalake_minio_airflow_spark.catalog import load_table
from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.sampling import (
    hash_sample,
    hash_split,
    stratified_quota,
)
from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.text import (
    clean_text,
    email_count,
    url_count,
)


def test_hash_sample_deterministic_and_unbiased(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(r.doc_id for r in hash_sample(docs, "doc_id", 0.5).collect())
    b = sorted(r.doc_id for r in hash_sample(docs, "doc_id", 0.5).collect())
    assert a == b, "same key + fraction must select the same rows"
    n = docs.count()
    # binomial(n, .5): 5 sigma tolerance
    assert abs(len(a) - n / 2) < 5 * (n * 0.25) ** 0.5
    # monotone: a smaller fraction selects a subset of a larger one
    small = {r.doc_id for r in hash_sample(docs, "doc_id", 0.2).collect()}
    assert small <= set(a) or not small  # thresholds nest by construction
    # a different salt draws an (almost surely) different sample
    salted = sorted(r.doc_id for r in hash_sample(docs, "doc_id", 0.5, salt="s1").collect())
    assert salted != a


def test_hash_sample_plan_has_no_shuffle(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = hash_sample(docs, "doc_id", 0.25)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "a Bernoulli sample must be a pure map-side filter"


def test_hash_split_partitions_and_weights(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.cnt for r in out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    n = docs.count()
    assert sum(counts.values()) == n, "split must partition the corpus"
    assert counts["train"] > counts.get("val", 0) and counts["train"] > counts.get("test", 0)
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", {"a": 0.5, "b": 0.4})


def test_stratified_quota_caps_each_group(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = stratified_quota(docs, "source", "doc_id", 7)
    per_group = out.groupBy("source").agg(F.count("*").alias("n")).collect()
    assert per_group and all(r.n <= 7 for r in per_group)
    # deterministic: same selection on re-run
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in stratified_quota(docs, "source", "doc_id", 7).collect())
    assert a == b
    # groups smaller than the quota are passed through whole
    sizes = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    kept = {r.source: r.n for r in per_group}
    for src, n in sizes.items():
        assert kept[src] == min(n, 7)


def test_clean_text_strips_html_urls_and_redacts_email(spark):
    df = spark.createDataFrame(
        [
            (1, "Hi <b>there</b> see https://example.com/x?y=1 now"),
            (2, "mail me: alice.smith+spam@mail.example.org today"),
            (3, "plain   text\twith\nwhitespace"),
        ],
        "id long, text string",
    )
    out = {
        r.id: (r.clean, r.urls, r.emails)
        for r in df.select(
            "id",
            clean_text("text").alias("clean"),
            url_count("text").alias("urls"),
            email_count("text").alias("emails"),
        ).collect()
    }
    assert out[1] == ("Hi there see now", 1, 0)
    assert out[2] == ("mail me: <EMAIL> today", 0, 1)
    assert out[3] == ("plain text with whitespace", 0, 0)


def test_mixture_sample_rates_and_stability(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.sampling import mixture_sample

    rows = [(i, f"g{i % 4}") for i in range(8000)]
    df = spark.createDataFrame(rows, "k long, g string")
    rates = {"g0": 1.0, "g1": 0.5, "g2": 0.0}
    out = mixture_sample(df, "g", "k", rates, default_rate=0.25)
    counts = {r.g: r.n for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts["g0"] == 2000          # rate 1.0 keeps everything
    assert "g2" not in counts            # rate 0.0 keeps nothing
    assert abs(counts["g1"] - 1000) < 120   # ~0.5 of 2000
    assert abs(counts.get("g3", 0) - 500) < 90  # default 0.25 of 2000
    # per-key stability: same verdict set on a re-run over a superset
    bigger = spark.createDataFrame(
        rows + [(i, f"g{i % 4}") for i in range(8000, 9000)], "k long, g string"
    )
    kept_small = {r.k for r in out.select("k").collect()}
    kept_big = {
        r.k
        for r in mixture_sample(bigger, "g", "k", rates, default_rate=0.25)
        .select("k")
        .collect()
        if r.k < 8000
    }
    assert kept_small == kept_big


def test_stratified_quota_preserves_caller_rk_column(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.sampling import stratified_quota
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, f"s{i % 2}", i * 10) for i in range(20)],
        ["doc_id", "source", "__rk"],
    )
    out = stratified_quota(df, "source", "doc_id", 3)
    assert "__rk" in out.columns  # caller's column survives
    assert out.count() == 6
    assert {r["__rk"] for r in out.collect()} <= {i * 10 for i in range(20)}


def test_hash_split_null_keys_get_null_split(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.sampling import hash_split
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("k", LongType())])
    df = spark.createDataFrame([(1,), (2,), (None,)], schema)
    out = hash_split(
        df, "k", {"train": 0.8, "test": 0.2}
    ).collect()
    by_k = {r["k"]: r["split"] for r in out}
    assert by_k[None] is None  # visible, not silently dumped in 'test'
    assert by_k[1] in ("train", "test") and by_k[2] in ("train", "test")
