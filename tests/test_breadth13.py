"""Planted-fixture semantics for the round-6 curation-operations
additions: leakage-safe group split, filter-funnel first-kill
attribution, and source-level boilerplate n-grams."""

from __future__ import annotations

from pyspark.sql import functions as F

from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.funnel import (
    funnel_attribution,
    funnel_report,
)
from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.sampling import group_split
from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.text import (
    boilerplate_ngram_stats,
)


def test_group_split_never_splits_a_group(spark):
    # 200 rows in 40 groups of 5 — every group must land whole
    df = spark.range(200).select(
        F.col("id"), (F.col("id") % 40).cast("string").alias("grp")
    )
    out = group_split(df, F.col("grp"), {"train": 0.5, "val": 0.25, "test": 0.25})
    spans = (
        out.groupBy("grp")
        .agg(F.countDistinct("split").alias("ns"), F.count("*").alias("n"))
        .collect()
    )
    assert all(r["ns"] == 1 and r["n"] == 5 for r in spans)
    # all three labels actually occur across 40 groups
    labels = {r["split"] for r in out.select("split").distinct().collect()}
    assert labels == {"train", "val", "test"}


def test_group_split_null_group_gets_null_split(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a")], "id long, grp string"
    )
    out = {r["id"]: r["split"] for r in group_split(
        df, F.col("grp"), {"train": 1.0}
    ).collect()}
    assert out[2] is None and out[1] == "train" and out[1] == out[3]


def test_group_split_agrees_with_row_split_on_group_key(spark):
    # a group key that IS the row key degenerates to hash_split
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.sampling import hash_split

    df = spark.range(100).select(F.col("id").cast("string").alias("k"))
    a = {r["k"]: r["split"] for r in group_split(
        df, F.col("k"), {"x": 0.5, "y": 0.5}
    ).collect()}
    b = {r["k"]: r["split"] for r in hash_split(
        df, "k", {"x": 0.5, "y": 0.5}
    ).collect()}
    assert a == b


def test_funnel_first_kill_attribution(spark):
    df = spark.createDataFrame(
        [
            (1, 5, "x"),   # killed by r1 (v < 10) even though r2 also fires
            (2, 50, "x"),  # killed by r2 (tag = x)
            (3, 50, "y"),  # survivor
            (4, None, "y"),# NULL v: r1 predicate NULL -> does not fire
        ],
        "id long, v long, tag string",
    )
    rules = [("small", F.col("v") < 10), ("tag_x", F.col("tag") == "x")]
    att = {r["id"]: r["killed_by"] for r in funnel_attribution(df, rules, "id").collect()}
    assert att == {1: "small", 2: "tag_x", 3: None, 4: None}


def test_funnel_report_cascade_counts(spark):
    df = spark.createDataFrame(
        [(i, i) for i in range(10)], "id long, v long"
    )
    rules = [
        ("lt3", F.col("v") < 3),        # kills 0,1,2
        ("never", F.col("v") > 100),    # kills nothing - must still appear
        ("even", F.col("v") % 2 == 0),  # kills 4,6,8 (3 already gone)
    ]
    rows = {r["rule"]: r for r in funnel_report(df, rules, "id").collect()}
    assert rows["lt3"]["stage"] == 1
    assert (rows["lt3"]["n_in"], rows["lt3"]["n_killed"], rows["lt3"]["n_out"]) == (10, 3, 7)
    assert (rows["never"]["n_in"], rows["never"]["n_killed"], rows["never"]["n_out"]) == (7, 0, 7)
    assert (rows["even"]["n_in"], rows["even"]["n_killed"], rows["even"]["n_out"]) == (7, 3, 4)


def test_funnel_zero_kills_and_empty_input(spark):
    # no rule fires: n_in must still carry the full row count (the
    # sentinel-survivor total path), and an empty input yields zeros
    df = spark.createDataFrame([(i,) for i in range(7)], "id long")
    rules = [("never", F.col("id") > 100)]
    r = funnel_report(df, rules, "id").collect()
    assert len(r) == 1 and (r[0]["n_in"], r[0]["n_killed"], r[0]["n_out"]) == (7, 0, 7)
    empty = funnel_report(df.filter(F.col("id") < 0), rules, "id").collect()
    assert (empty[0]["n_in"], empty[0]["n_killed"], empty[0]["n_out"]) == (0, 0, 0)


def test_funnel_empty_rules_rejected(spark):
    import pytest

    df = spark.range(1)
    with pytest.raises(ValueError):
        funnel_report(df, [], "id")


def test_boilerplate_planted_template(spark):
    # source s1: footer "x y z w q r" present in 3/4 docs (75% >= 20%);
    # each doc also carries a unique 6-token tail. 6-grams of a
    # 12-token doc: 7; footer contributes grams only where the window
    # stays inside the footer (1 per doc here since footer leads).
    footer = "x y z w q r"
    rows = [
        (1, "s1", footer + " a1 b1 c1 d1 e1 f1"),
        (2, "s1", footer + " a2 b2 c2 d2 e2 f2"),
        (3, "s1", footer + " a3 b3 c3 d3 e3 f3"),
        (4, "s1", "p1 p2 p3 p4 p5 p6 p7 p8 p9 pa pb pc"),
        (5, "s2", footer),  # different source: own 20% threshold
        (6, None, None),    # NULL text excluded entirely
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # min_pct=60 over 4 s1 docs: boilerplate needs n_with*100 >= 240,
    # i.e. presence in >= 3 docs — the footer gram (3/4) qualifies,
    # unique tails (1/4) do not
    out = {r["doc_id"]: r for r in boilerplate_ngram_stats(
        df, "doc_id", "text", "source", n=6, min_pct=60
    ).collect()}
    assert 6 not in out  # NULL text never scored
    # docs 1-3: 7 grams each, exactly the leading footer gram shared
    for d in (1, 2, 3):
        assert out[d]["n_grams"] == 7 and out[d]["n_boiler"] == 1
        assert abs(out[d]["boiler_ratio"] - round(1 / 7, 4)) < 1e-9
    # doc 4: all grams unique (1/4 docs = 25% < 60%) -> zero boiler
    assert out[4]["n_grams"] == 7 and out[4]["n_boiler"] == 0
    # doc 5 is the only s2 doc: its single whole-doc gram trivially
    # clears the threshold within its own source
    assert out[5]["n_grams"] == 1 and out[5]["n_boiler"] == 1


def test_boilerplate_null_source_is_its_own_group(spark):
    # two NULL-source docs sharing a footer must see each other (the
    # null-safe join); a named source must not absorb them
    rows = [
        (1, None, "x y z w q r a b c d e f"),
        (2, None, "x y z w q r g h i j k l"),
        (3, "s1", "x y z w q r m n o p q2 r2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r for r in boilerplate_ngram_stats(
        df, "doc_id", "text", "source", n=6, min_pct=60
    ).collect()}
    # NULL group has 2 docs: shared leading gram = 2/2 = 100% >= 60%;
    # unique tails = 1/2 = 50% < 60%
    for d in (1, 2):
        assert out[d]["n_grams"] == 7 and out[d]["n_boiler"] == 1
    # s1 has 1 doc: every gram is 1/1 = 100%
    assert out[3]["n_boiler"] == out[3]["n_grams"] == 7


def test_semantic_contamination_planted(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.contamination import (
        semantic_contamination,
    )

    bench = spark.createDataFrame(
        [(100, [1.0, 0.0]), (101, [0.0, 0.0])],  # second is zero-norm
        "vec_id long, embedding array<float>",
    )
    corpus = spark.createDataFrame(
        [
            (1, [2.0, 0.0]),    # parallel to bench 100 -> cos 1.0
            (2, [0.0, 3.0]),    # orthogonal -> cos 0.0
            (3, [1.0, 1.0]),    # 45 degrees -> ~0.7071
            (4, [0.0, 0.0]),    # zero-norm corpus row: NULL max, not contaminated
            (5, None),          # NULL embedding excluded entirely
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in semantic_contamination(
        corpus, bench, threshold=0.7
    ).collect()}
    assert 5 not in out
    assert out[1]["max_cos"] == 1.0 and out[1]["contaminated"]
    assert out[2]["max_cos"] == 0.0 and not out[2]["contaminated"]
    assert abs(out[3]["max_cos"] - 0.7071) < 1e-9 and out[3]["contaminated"]
    # the zero-norm BENCH vector must not poison any max (NULL, never NaN)
    assert out[4]["max_cos"] is None and out[4]["contaminated"] is False


def test_token_budget_select_boundary(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.sampling import (
        token_budget_select,
    )

    # qualities: 0.9 (two docs, 40+30 tokens), 0.5 (three docs,
    # 25+25+25), 0.1 (one doc). budget=100: both 0.9s (70), then the
    # 0.5 bucket admits docs 3 (95) but NOT 4 (120) — id order.
    rows = [
        (1, 0.9, 40), (2, 0.9, 30),
        (3, 0.5, 25), (4, 0.5, 25), (5, 0.5, 25),
        (6, 0.1, 10),
    ]
    df = spark.createDataFrame(rows, "doc_id long, q double, nt long")
    out = {r["doc_id"]: r for r in token_budget_select(
        df, F.col("q"), F.col("nt"), budget=100, id_col="doc_id"
    ).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["cum_tokens"] == 40 and out[2]["cum_tokens"] == 70
    assert out[3]["cum_tokens"] == 95 and out[3]["quality"] == 0.5
    # exact-fit budget keeps the boundary doc
    out2 = {r["doc_id"] for r in token_budget_select(
        df, F.col("q"), F.col("nt"), budget=120, id_col="doc_id"
    ).collect()}
    assert out2 == {1, 2, 3, 4}
    # budget smaller than the first doc selects nothing
    assert token_budget_select(
        df, F.col("q"), F.col("nt"), budget=5, id_col="doc_id"
    ).count() == 0
    # NULL quality rows are excluded, not ranked
    df2 = spark.createDataFrame(
        [(1, None, 10), (2, 0.5, 10)], "doc_id long, q double, nt long"
    )
    kept = token_budget_select(
        df2, F.col("q"), F.col("nt"), budget=100, id_col="doc_id"
    ).collect()
    assert [r["doc_id"] for r in kept] == [2]


def test_rrf_fuse_single_arm_and_overlap(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rnk int")
    b = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rnk int")
    out = {r["doc_id"]: r["rrf_score"] for r in rrf_fuse(
        a, b, k_rrf=60, topk=10
    ).collect()}
    # doc 2 fuses both arms: 1/62 + 1/61
    assert abs(out[2] - round(1 / 62 + 1 / 61, 4)) < 1e-12
    # single-arm docs carry only their own term
    assert abs(out[1] - round(1 / 61, 4)) < 1e-12
    assert abs(out[3] - round(1 / 62, 4)) < 1e-12
    # fused overlap outranks either single arm
    assert out[2] > out[1] > out[3]


def test_stream_funnel_monitor_matches_batch(spark, tmp_path):
    """Drain the streaming funnel over sharded documents and compare
    its final report against the batch funnel_report on the same data
    — stream and batch share funnel_report_from_counts, so this pins
    the complete-mode aggregation + assignment accumulator."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from bootcamp_stackacademy_datalake_minio_airflow_spark.streaming.curation import (
        stream_funnel_monitor,
    )

    rows = [
        (1, "the cat sat on the mat and the dog is here today again"),
        (2, "short"),
        (3, None),
        (4, "x " * 40),         # repetitive: 1 distinct token of 40
        (5, "der hund und die katze und der vogel und das haus ist hier"),
        (6, "the " + " ".join(f"w{i}" for i in range(40))),
    ]
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("text", StringType(), True),
        ]
    )
    docs = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "funnel_src")
    docs.repartition(3).write.parquet(src)

    rules = [
        ("null_text", F.col("text").isNull()),
        ("too_short", F.length("text") < 10),
        ("not_en", ~F.col("text").contains("the")),
        ("repetitive", F.size(F.array_distinct(F.split(F.col("text"), " "))) * 2
         < F.size(F.split(F.col("text"), " "))),
    ]
    q, report = stream_funnel_monitor(
        spark, src, rules, schema, max_files_per_trigger=1
    )
    q.awaitTermination()

    batch = sorted(
        funnel_report(docs, rules, "doc_id").collect(), key=lambda r: r["stage"]
    )
    assert [tuple(r) for r in report] == [tuple(r) for r in batch]
    assert report[0]["n_in"] == 6 and report[-1]["n_out"] >= 1


def test_curation_dag_task_bodies_end_to_end(spark, sf_dir, tmp_path, monkeypatch):
    """Execute the four curation-DAG task bodies (plain functions —
    no Airflow needed) against a local lake and check the hand-offs:
    filtered ⊆ input, canonical has no duplicate texts, splits
    partition the canonical docs group-safely, and every train doc
    lands in exactly one pack."""
    import dags.curation_pipeline as cp

    monkeypatch.setenv("LAKE_BASE", str(tmp_path))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.write.parquet(str(tmp_path / "silver" / "olist" / "documents"))

    cp._run_funnel_filter()
    cp._run_dedup_canonical()
    cp._run_leakage_split()
    cp._run_pack_sequences()

    from bootcamp_stackacademy_datalake_minio_airflow_spark.catalog import zone_path

    filtered = spark.read.parquet(zone_path("gold", "docs_filtered"))
    report = spark.read.parquet(zone_path("gold", "docs_filtered_report"))
    canonical = spark.read.parquet(zone_path("gold", "docs_canonical"))
    split = spark.read.parquet(zone_path("gold", "docs_split"))
    packed = spark.read.parquet(zone_path("gold", "train_packed"))

    n_docs = docs.count()
    assert 0 < filtered.count() < n_docs
    rep = sorted(report.collect(), key=lambda r: r["stage"])
    assert rep[0]["n_in"] == n_docs and rep[-1]["n_out"] == filtered.count()
    # canonical: one row per distinct text among the filtered
    assert canonical.count() == filtered.select("text").distinct().count()
    # split partitions canonical; identical texts share a split
    assert split.count() == canonical.count()
    from pyspark.sql import functions as FF

    spans = split.groupBy("text").agg(
        FF.countDistinct("split").alias("ns")
    ).collect()
    assert all(r["ns"] == 1 for r in spans)
    # packing covers exactly the train split, one slot per doc
    n_train = split.filter(FF.col("split") == "train").count()
    assert packed.count() == n_train
    assert packed.select("doc_id").distinct().count() == n_train


def test_chi2_independence_hand_computed(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.analytics import (
        chi2_independence,
    )

    # 2x2 with counts [[10, 20], [20, 10]]: n=60, all margins 30.
    # expected all 15 -> chi2 = 4 * (5^2/15) = 6.6667, dof = 1
    rows = (
        [("s1", "en")] * 10 + [("s1", "de")] * 20
        + [("s2", "en")] * 20 + [("s2", "de")] * 10
        + [(None, "en"), ("s1", None)]  # NULL categories excluded
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi2_independence(df, "a", "b").collect()[0]
    assert r["dof"] == 1 and r["n"] == 60
    assert abs(r["chi2"] - round(4 * 25 / 15, 4)) < 1e-9
    # perfectly independent table -> chi2 == 0
    rows2 = [("s1", "en")] * 6 + [("s1", "de")] * 6 + [("s2", "en")] * 3 + [("s2", "de")] * 3
    r2 = chi2_independence(
        spark.createDataFrame(rows2, "a string, b string"), "a", "b"
    ).collect()[0]
    assert r2["chi2"] == 0.0 and r2["dof"] == 1 and r2["n"] == 18


def test_ks_two_sample_hand_computed(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.analytics import ks_two_sample

    # A = {1,2,3,4}, B = {3,4,5,6}: D = |ECDF_A - ECDF_B| peaks at
    # x=2 (2/4 - 0/4) and x=4 (4/4 - 2/4) -> 0.5
    rows = [(v, "a") for v in (1, 2, 3, 4)] + [(v, "b") for v in (3, 4, 5, 6)]
    df = spark.createDataFrame(rows, "v long, s string")
    r = ks_two_sample(df, "v", F.col("s") == "a").collect()[0]
    assert (r["n_a"], r["n_b"]) == (4, 4) and abs(r["d_stat"] - 0.5) < 1e-9
    # identical distributions -> D = 0
    rows2 = [(v, s) for v in (1, 2, 3) for s in ("a", "b")]
    r2 = ks_two_sample(
        spark.createDataFrame(rows2, "v long, s string"), "v", F.col("s") == "a"
    ).collect()[0]
    assert r2["d_stat"] == 0.0
    # one empty side -> NULL d_stat, visible counts
    r3 = ks_two_sample(
        spark.createDataFrame([(1, "b")], "v long, s string"), "v", F.col("s") == "a"
    ).collect()[0]
    assert r3["d_stat"] is None and (r3["n_a"], r3["n_b"]) == (0, 1)


def test_table_checksum_order_insensitive_and_change_sensitive(spark, sf_dir):
    import __spark_entry__ as ep

    q = ep.queries()["orders_table_checksum"]
    base = q(spark, sf_dir).collect()[0]
    assert base["n_rows"] > 0 and base["checksum"] != 0
    # partitioning/order insensitivity: the same rows through a wild
    # repartition must hash identically (XOR is commutative)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    import tempfile

    d = tempfile.mkdtemp(prefix="cksum-")
    orders.repartition(17).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    again = q(spark, d).collect()[0]
    assert (again["n_rows"], again["checksum"]) == (base["n_rows"], base["checksum"])
    # change sensitivity: dropping one row flips the checksum
    first_key = orders.select("o_orderkey").orderBy("o_orderkey").first()[0]
    orders.filter(F.col("o_orderkey") != first_key).write.mode(
        "overwrite"
    ).parquet(f"{d}/orders.parquet")
    changed = q(spark, d).collect()[0]
    assert changed["n_rows"] == base["n_rows"] - 1
    assert changed["checksum"] != base["checksum"]


def test_mixture_entropy_balanced_vs_skewed(spark, tmp_path):
    import math

    import __spark_entry__ as ep

    q = ep.queries()["corpus_mixture_entropy"]
    # two sources, equal token mass -> entropy = ln(2)
    bal = [(1, "s1", "a b c d"), (2, "s2", "e f g h")]
    spark.createDataFrame(
        bal, "doc_id long, source string, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    r = q(spark, str(tmp_path)).collect()[0]
    assert r["n_sources"] == 2 and r["total_tokens"] == 8
    assert abs(r["entropy"] - round(math.log(2), 4)) < 1e-9
    # one source takes (almost) everything -> entropy near 0
    skew = [(1, "s1", "a " * 99 + "a"), (2, "s2", "b")]
    spark.createDataFrame(
        skew, "doc_id long, source string, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    r2 = q(spark, str(tmp_path)).collect()[0]
    assert r2["entropy"] < 0.06


def test_dup_cluster_histogram_planted(spark, tmp_path):
    import __spark_entry__ as ep

    q = ep.queries()["dup_cluster_histogram"]
    prefix = "p1 p2 p3 p4 p5 p6 p7 p8"
    rows = (
        [(i, f"{prefix} tail{i}") for i in range(3)]     # one cluster of 3
        + [(10, "q1 q2 q3 q4 q5 q6 q7 q8 x"),            # cluster of 2
           (11, "q1 q2 q3 q4 q5 q6 q7 q8 y")]
        + [(20, "solo one two three four five six seven")]  # singleton
        + [(30, None)]                                      # excluded
    )
    spark.createDataFrame(
        rows, "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    hist = {r["cluster_size"]: r for r in q(spark, str(tmp_path)).collect()}
    assert hist[3]["n_clusters"] == 1 and hist[3]["n_docs"] == 3
    assert hist[2]["n_clusters"] == 1 and hist[2]["n_docs"] == 2
    assert hist[1]["n_clusters"] == 1 and hist[1]["n_docs"] == 1
