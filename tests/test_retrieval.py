"""Unit tests for operators/retrieval.py: BM25 ranking, bigram-LM NLL
scoring, token chunking, and phrase search — planted fixtures with
hand-computed expectations, plus plan assertions for the map-only ops.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.retrieval import (
    bigram_nll_score,
    bm25_topk,
    chunk_tokens,
    phrase_positions,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark hash join spark"),
        (2, "merge sort window"),
        (3, "the quick brown fox"),
        (4, "spark spark spark hash window merge"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bm25_ranking_and_values(corpus):
    out = {r["doc_id"]: r["score"] for r in bm25_topk(
        corpus, ["spark", "hash"], k=10
    ).collect()}
    # hand-computed: N=4, dl = [4,3,4,6], avgdl = 17/4
    n, avgdl, k1, b = 4.0, 17.0 / 4.0, 1.2, 0.75

    def idf(df):
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def w(tf, dl):
        return tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    exp1 = round(idf(2) * w(2, 4) + idf(2) * w(1, 4), 4)
    exp4 = round(idf(2) * w(3, 6) + idf(2) * w(1, 6), 4)
    assert out == {1: exp1, 4: exp4}
    # doc 4 has more spark occurrences but is longer; both must rank
    # above absent docs (2, 3 contain no query term -> no row)
    assert 2 not in out and 3 not in out


def test_bm25_tie_break_and_limit(spark):
    rows = [(i, "alpha beta") for i in range(1, 8)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = bm25_topk(df, ["alpha"], k=3).collect()
    # identical docs -> identical scores -> ties break on doc_id
    assert [r["doc_id"] for r in got] == [1, 2, 3]


def test_bigram_nll_hand_example(spark):
    # corpus: "a b a b" and "a b c": bigrams ab, ba, ab | ab, bc
    df = spark.createDataFrame([(1, "a b a b"), (2, "a b c")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in bigram_nll_score(df).collect()}
    v = 3.0  # vocab {a, b, c}
    c12 = {("a", "b"): 3.0, ("b", "a"): 1.0, ("b", "c"): 1.0}
    c1 = {"a": 3.0, "b": 2.0}

    def nll(w1, w2):
        return -math.log((c12[(w1, w2)] + 0.5) / (c1[w1] + 0.5 * v))

    exp1 = round((2 * nll("a", "b") + nll("b", "a")) / 3, 4)
    exp2 = round((nll("a", "b") + nll("b", "c")) / 2, 4)
    assert out[1]["n_bigrams"] == 3 and out[1]["avg_nll"] == pytest.approx(exp1)
    assert out[2]["n_bigrams"] == 2 and out[2]["avg_nll"] == pytest.approx(exp2)


def test_bigram_nll_skips_single_token_docs(spark):
    df = spark.createDataFrame([(1, "lonely"), (2, "a b")], ["doc_id", "text"])
    got = bigram_nll_score(df).collect()
    assert [r["doc_id"] for r in got] == [2]


def test_chunk_tokens_windows(spark):
    text = " ".join(f"t{i}" for i in range(70))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = sorted(
        chunk_tokens(df, window=32, stride=24).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # 70 tokens, stride 24 -> starts 0, 24, 48
    assert [(r["chunk_idx"], r["start_tok"], r["chunk_len"], r["first_token"])
            for r in got] == [(0, 0, 32, "t0"), (1, 24, 32, "t24"), (2, 48, 22, "t48")]


def test_chunk_tokens_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "x y z")], ["doc_id", "text"])
    got = chunk_tokens(df, window=32, stride=24).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["start_tok"], r["chunk_len"], r["first_token"]) == (0, 3, "x")


def test_phrase_positions_matches_and_offsets(spark):
    rows = [
        (1, "x value table part y value table part"),  # matches at 1 and 5
        (2, "value table"),                            # incomplete phrase
        (3, "part table value"),                       # wrong order
        (4, "value table part"),                       # match at 0
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: (r["n_matches"], r["first_pos"])
           for r in phrase_positions(df, ["value", "table", "part"]).collect()}
    assert out == {1: (2, 1), 4: (1, 0)}


def test_phrase_positions_rejects_empty():
    with pytest.raises(ValueError):
        phrase_positions(None, [])


def test_map_only_plans_have_no_exchange(corpus):
    """chunk_tokens and phrase_positions must stay shuffle-free —
    their 100 TB story is a pure scan->flatMap/filter."""
    for df in (
        chunk_tokens(corpus),
        phrase_positions(corpus, ["spark", "hash"]),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_bm25_single_posting_shuffle(corpus):
    """BM25's corpus-sized aggregation happens once, over postings
    already filtered to the query terms: the term filter must sit
    below the first aggregation exchange in the plan."""
    plan = bm25_topk(corpus, ["spark"])._jdf.queryExecution().optimizedPlan().toString()
    filter_lines = [ln for ln in plan.splitlines() if "Filter" in ln and "spark" in ln]
    assert filter_lines, plan  # the literal term filter survives optimization


def test_blank_docs_emit_no_chunks_and_skip_bm25_stats(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, "   ")], ["doc_id", "text"]
    )
    assert sorted(
        r["doc_id"] for r in chunk_tokens(df).select("doc_id").collect()
    ) == [1]
    # blank docs must not count toward N/avgdl: with only doc 1 real,
    # N=1, df=1 -> idf = ln(1 + 0.5/1.5) = ln(4/3); dl == avgdl so the
    # tf term collapses to exactly 1
    import math

    got = bm25_topk(df, ["alpha"], k=10).collect()
    assert [r["doc_id"] for r in got] == [1]
    assert got[0]["score"] == pytest.approx(round(math.log(4.0 / 3.0), 4))


def test_bm25_and_phrase_normalize_query_terms(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.retrieval import (
        bm25_topk,
        phrase_positions,
    )
    import pytest as _pytest

    docs = spark.createDataFrame(
        [(1, "the spark table is fast"), (2, "value table row")],
        ["doc_id", "text"],
    )
    # uppercase / padded queries must match the lowercased corpus form
    assert bm25_topk(docs, ["  SPARK "]).count() == 1
    out = phrase_positions(docs, ["Spark", "TABLE"]).collect()
    assert len(out) == 1 and out[0]["first_pos"] == 1
    with _pytest.raises(ValueError):
        bm25_topk(docs, [])
    with _pytest.raises(ValueError):
        bm25_topk(docs, ["  "])
    with _pytest.raises(ValueError):
        phrase_positions(docs, ["a", " "])


def test_bigram_vocab_ignores_blank_doc_artifact(spark):
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.retrieval import bigram_nll_score

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], ["doc_id", "text"]
    )
    with_blank = docs.unionByName(
        spark.createDataFrame([(3, "   ")], ["doc_id", "text"])
    )
    base = {r["doc_id"]: r["avg_nll"] for r in bigram_nll_score(docs).collect()}
    plus = {
        r["doc_id"]: r["avg_nll"]
        for r in bigram_nll_score(with_blank).collect()
    }
    # a whitespace-only doc adds no bigrams AND no vocabulary type, so
    # every score is unchanged
    assert base == plus


def test_ndcg_hand_computed_perfect_and_degenerate(spark):
    """d1 (rel 2) outscores d2 (rel 1) under BM25, d3 (rel 0) never
    enters the posting list — so the ranking IS the ideal one:
    DCG = IDCG = (2^2-1)/log2(2) + (2^1-1)/log2(3) = 3.6309 and
    nDCG = 1.0. An all-irrelevant corpus has IDCG = 0 and must report
    NULL nDCG, not raise."""
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.retrieval import ndcg_at_k

    docs = spark.createDataFrame(
        [
            (1, "spark hash spark pipeline"),
            (2, "spark alone in prose here"),
            (3, "nothing relevant at all"),
        ],
        "doc_id long, text string",
    )
    r = ndcg_at_k(docs, ["spark", "hash"], k=10).first()
    assert (r.k, r.dcg, r.idcg, r.ndcg) == (10, 3.6309, 3.6309, 1.0)

    none = spark.createDataFrame([(1, "no match here")], "doc_id long, text string")
    r0 = ndcg_at_k(none, ["spark"], k=10).first()
    assert r0.ndcg is None and r0.idcg == 0.0


def test_winnow_overlap_pairs_planted_quote(spark):
    """Two docs sharing a >= k+window-1 = 12-char substring (k=8, w=5
    here) must surface as a pair; unrelated docs must not; a
    boilerplate fingerprint in EVERY doc is killed by the df cap."""
    from bootcamp_stackacademy_datalake_minio_airflow_spark.operators.text import winnow_overlap_pairs

    quote = "the exact same quoted passage lives here"
    boiler = "standard footer text on all pages"
    rows = [
        (1, f"alpha document body {quote} first unique tail"),
        (2, f"second beginning differs {quote} omega ending"),
        (3, "completely unrelated content nothing shared xyz"),
        (4, f"third page {boiler} unique middle one"),
        (5, f"fourth page {boiler} unique middle two"),
        (6, f"fifth page {boiler} unique middle three"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnow_overlap_pairs(
            df, "doc_id", "text", k=8, window=5, min_shared=2, max_df=2
        ).collect()
    }
    # the quote pair survives; the boilerplate trio (df=3 > max_df=2)
    # is cut, so docs 4/5/6 pair only through their shared-page grams
    # if those beat the cap — with max_df=2 they cannot
    assert (1, 2) in got and got[(1, 2)] >= 2
    assert all(a == 1 and b == 2 for (a, b) in got), got
