"""Prose-lake generator pins (VERDICT r9 ask #7): the bench's
real-vocabulary tier is only trustworthy if the lake is deterministic
and its planted dup/quotation tail is actually there."""

from __future__ import annotations

import duckdb
import pytest

from bootcamp_stackacademy_datalake_minio_airflow_spark.suites.prose import (
    LINCOLN_QUOTE,
    MELVILLE_QUOTE,
)
from bootcamp_stackacademy_datalake_minio_airflow_spark.suites.prose_lake import (
    N_DOCS,
    _fingerprint,
    _rows,
    prose_lake_dir,
)


@pytest.fixture(scope="module")
def lake(tmp_path_factory, sf_dir) -> str:
    return prose_lake_dir(sf_dir, str(tmp_path_factory.mktemp("prose-lake")))


def test_generation_is_deterministic():
    rows_a, rows_b = _rows(), _rows()
    assert rows_a == rows_b
    assert _fingerprint(rows_a) == _fingerprint(rows_b)
    assert len(rows_a) == N_DOCS
    # sf0.1-comparable volume: ~5k docs, >= 1M chars of prose
    assert sum(r[4] for r in rows_a) > 1_000_000


def test_planted_tail_is_recoverable(lake):
    con = duckdb.connect()
    docs = f"read_parquet('{lake}/documents.parquet')"
    n, chars = con.execute(
        f"SELECT COUNT(*), SUM(n_chars) FROM {docs}"
    ).fetchone()
    assert n == N_DOCS and chars > 1_000_000
    # every i % 50 == 7 doc embeds the full Lincoln quotation; the
    # global count may exceed the plant by a few chance window-
    # adjacency reassemblies, so pin the planted rows exactly and
    # the total as a floor
    planted = con.execute(
        f"SELECT COUNT(*) FROM {docs} "
        "WHERE doc_id % 50 = 7 AND NOT contains(text, $1)",
        [LINCOLN_QUOTE],
    ).fetchone()[0]
    assert planted == 0, "a planted Lincoln embed is missing"
    assert (
        con.execute(
            f"SELECT COUNT(*) FROM {docs} WHERE doc_id % 50 = 23 "
            "AND NOT contains(text, $1)",
            [MELVILLE_QUOTE],
        ).fetchone()[0]
        == 0
    ), "a planted Melville embed is missing"
    # exact-duplicate pairs: doc i (i % 100 == 41) == doc i-1
    broken = con.execute(
        f"""
        SELECT COUNT(*) FROM {docs} a JOIN {docs} b
          ON a.doc_id % 100 = 41 AND b.doc_id = a.doc_id - 1
        WHERE a.text <> b.text
        """
    ).fetchone()[0]
    assert broken == 0, "an exact-dup plant diverged from its donor"
    # all four languages present, en-weighted
    langs = dict(
        con.execute(f"SELECT lang, COUNT(*) FROM {docs} GROUP BY 1").fetchall()
    )
    con.close()
    assert set(langs) == {"en", "de", "es", "fr"}
    assert langs["en"] > 3 * max(langs["de"], langs["es"], langs["fr"])


def test_langid_runs_on_the_lake(spark, lake):
    """The bench's proselake_langid_eval_metrics entry must be a real
    evaluation: on genuine prose the detector should get the bulk of
    en/de/es/fr right (recall floor 0.7 per class — behaviour, not a
    tuned constant)."""
    import __spark_entry__ as ep

    rows = ep.queries()["langid_eval_metrics"](spark, lake).collect()
    by_class = {r["clazz"]: r for r in rows if r["clazz"] is not None}
    for lang in ("en", "de", "es", "fr"):
        assert by_class[lang]["recall"] >= 0.7, (lang, by_class[lang])
