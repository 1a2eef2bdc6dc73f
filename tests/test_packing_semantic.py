"""Sequence packing (greedy first-fit) + semantic dedup clustering."""

from __future__ import annotations

from pyspark.sql import functions as F

from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.packing import pack_sequences
from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.similarity import semantic_clusters


def test_pack_greedy_semantics(spark):
    # one bucket (n_buckets=1) so the whole sequence is one greedy scan:
    # 100+100 fit in 256; +100 overflows -> new pack; 300 oversized ->
    # its own pack; 50+200 fit; 10 overflows 256? 50+200+10=260 > 256
    rows = [(i, n) for i, n in enumerate([100, 100, 100, 300, 50, 200, 10])]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = pack_sequences(df, "doc_id", F.col("n_tok"), budget=256, n_buckets=1)
    got = {r.doc_id: r.pack_id for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 1, 3: 2, 4: 3, 5: 3, 6: 4}


def test_pack_respects_budget_and_buckets(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = pack_sequences(
        docs, "doc_id", F.size(F.split(F.col("text"), " ")), budget=256, n_buckets=8
    ).cache()
    # every doc appears exactly once
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    # bucket assignment is id % 8
    assert out.filter(F.col("bucket") != F.col("doc_id") % 8).count() == 0
    # no pack exceeds the budget unless it is a single oversized doc
    packs = out.groupBy("bucket", "pack_id").agg(
        F.sum("n_tok").alias("tot"), F.count("*").alias("n")
    )
    assert packs.filter((F.col("tot") > 256) & (F.col("n") > 1)).count() == 0
    out.unpersist()


def test_cc_driver_and_distributed_paths_agree(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.dedup import (
        connected_components,
    )

    # chain 1-2-3-4, star 10-(11,12), singleton edge 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    fast = {(r.node, r.component) for r in connected_components(pairs).collect()}
    dist = {
        (r.node, r.component)
        for r in connected_components(pairs, driver_budget_edges=0).collect()
    }
    expect = {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10), (12, 10), (20, 20), (21, 20)}
    assert fast == expect
    assert dist == expect


def test_semantic_clusters_labels(spark):
    # two tight clusters (0,1,2) and (10,11) plus an isolated vector 20
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0]),
        (2, [0.98, 0.15, 0.0]),
        (10, [0.0, 1.0, 0.0]),
        (11, [0.0, 0.99, 0.12]),
        (20, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: r.cluster_id for r in semantic_clusters(df, 0.9).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 20: 20}
