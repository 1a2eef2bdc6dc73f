"""Planted-fixture semantics for the round-6 additions: n-gram
novelty, DSIR importance weights, and the hot-key skew demo's
aggregate identity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.contamination import ngram_novelty
from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.sampling import dsir_importance


def test_ngram_novelty_first_appearance_attribution(spark):
    # doc 10: fresh; doc 20: exact copy of 10 (novelty 0); doc 30:
    # shares a 3-gram prefix window with 10 but adds new tail grams
    df = spark.createDataFrame(
        [
            (10, "a b c d e"),
            (20, "a b c d e"),
            (30, "a b c x y"),
            (40, None),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in ngram_novelty(df, "doc_id", "text", n=3).collect()
    }
    # doc 10: grams {abc, bcd, cde} all first-seen here
    assert out[10]["n_grams"] == 3 and out[10]["n_novel"] == 3
    assert out[10]["novelty"] == 1.0
    # doc 20: identical grams, all first seen in doc 10
    assert out[20]["n_grams"] == 3 and out[20]["n_novel"] == 0
    assert out[20]["novelty"] == 0.0
    # doc 30: {abc (old), bcx, cxy} -> 2 of 3 novel
    assert out[30]["n_grams"] == 3 and out[30]["n_novel"] == 2
    assert abs(out[30]["novelty"] - round(2 / 3, 4)) < 1e-9
    # NULL text is excluded, not scored
    assert 40 not in out


def test_ngram_novelty_short_doc_whole_text_gram(spark):
    df = spark.createDataFrame(
        [(1, "hello"), (2, "hello"), (3, "world")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(df, n=8).collect()}
    assert out[1]["n_grams"] == 1 and out[1]["n_novel"] == 1
    assert out[2]["n_novel"] == 0
    assert out[3]["n_novel"] == 1


def test_dsir_importance_hand_computed(spark):
    # target docs are pure "x"; raw docs pure "y"; one mixed doc.
    df = spark.createDataFrame(
        [
            (1, "x x", "tgt"),
            (2, "y y y", "raw"),
            (3, "x y", "raw"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        r["doc_id"]: r
        for r in dsir_importance(
            df, F.col("source") == "tgt", "doc_id", "text"
        ).collect()
    }
    # vocab: x (n_t=2, n_r=1), y (n_t=0, n_r=4); tt=2, rr=5, v=2
    lr_x = math.log(((2 + 1.0) * (5 + 2)) / ((1 + 1.0) * (2 + 2)))
    lr_y = math.log(((0 + 1.0) * (5 + 2)) / ((4 + 1.0) * (2 + 2)))
    assert out[1]["n_tokens"] == 2
    assert abs(out[1]["logratio"] - round(lr_x, 4)) < 1e-9
    assert out[2]["n_tokens"] == 3
    assert abs(out[2]["logratio"] - round(lr_y, 4)) < 1e-9
    assert abs(out[3]["logratio"] - round((lr_x + lr_y) / 2, 4)) < 1e-6
    # target-like doc must outrank raw-like doc
    assert out[1]["logratio"] > out[3]["logratio"] > out[2]["logratio"]


def test_dsir_importance_excludes_null_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "x", "tgt"), (2, None, "raw"), (3, "   ", "raw")],
        "doc_id long, text string, source string",
    )
    out = dsir_importance(df, F.col("source") == "tgt").collect()
    # NULL text excluded; whitespace-only text has zero tokens after
    # normalization -> no row (mean over zero tokens is undefined)
    assert {r["doc_id"] for r in out} == {1}


def test_hot_key_join_matches_plain_groupby(spark, sf_dir):
    """The skew-shaped plan (union dim + merge hint) must be result-
    identical to the naive formulation it exists to accelerate."""
    import __spark_entry__ as ep

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    hk_l = F.when(F.col("l_orderkey") % 4 != 0, F.lit(-1)).otherwise(
        F.col("l_orderkey")
    )
    hk_o = F.when(F.col("o_orderkey") % 4 != 0, F.lit(-1)).otherwise(
        F.col("o_orderkey")
    )
    naive = (
        li.select(hk_l.alias("hk"), "l_quantity", "l_returnflag")
        .join(
            orders.select(hk_o.alias("hk"))
            .groupBy("hk")
            .agg(F.count(F.lit(1)).cast("long").alias("n_orders")),
            "hk",
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_li"),
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.sum("n_orders").cast("long").alias("n_orders_sum"),
        )
    )
    got = {
        r["l_returnflag"]: (r["n_li"], r["sum_qty"], r["n_orders_sum"])
        for r in ep.queries()["lineitem_hot_key_join"](spark, sf_dir).collect()
    }
    want = {
        r["l_returnflag"]: (r["n_li"], r["sum_qty"], r["n_orders_sum"])
        for r in naive.collect()
    }
    assert got == want


def test_profile_table_planted(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.functions.quality import profile_table

    df = spark.createDataFrame(
        [(1, 2.5, "a"), (1, None, "b"), (3, 7.5, None)],
        "k long, v double, s string",
    )
    out = {r["col_name"]: r for r in profile_table(df).collect()}
    assert out["k"]["n_rows"] == 3
    assert out["k"]["n_nulls"] == 0 and out["k"]["n_distinct"] == 2
    assert out["k"]["min_num"] == 1.0 and out["k"]["max_num"] == 3.0
    assert out["v"]["n_nulls"] == 1 and out["v"]["n_distinct"] == 2
    assert out["v"]["min_num"] == 2.5 and out["v"]["max_num"] == 7.5
    # string column: distinct/nulls counted, min/max left NULL
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_num"] is None and out["s"]["max_num"] is None


def test_profile_table_empty_input(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.functions.quality import profile_table

    df = spark.createDataFrame([], "k long, s string")
    out = {r["col_name"]: r for r in profile_table(df).collect()}
    assert out["k"]["n_rows"] == 0 and out["k"]["n_nulls"] == 0
    assert out["k"]["n_distinct"] == 0 and out["k"]["min_num"] is None
