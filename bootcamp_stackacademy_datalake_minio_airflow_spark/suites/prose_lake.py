"""Parquet prose lake at sf0.1-comparable volume (VERDICT r9 ask #7).

The checked-in real-prose corpus (suites/prose.py) is ten paragraphs
— enough to hash-gate operator BEHAVIOUR on genuine vocabulary, but
the bench still ran every text/dedup family on the synthetic
small-vocab `documents` table only. This module scales the ten
paragraphs into a ~5,000-doc / ~1.5M-char parquet lake (the sf0.1
`documents` shape) so the winnow / dup-span / langid families can be
BENCHED on realistic vocabulary, not just tested on it.

Generation protocol (fully deterministic — ``random.Random(doc
index)``, no wall clock):

- Each doc is composed of contiguous WORD WINDOWS (5–12 consecutive
  words) sampled from the paragraphs of ONE language, so local
  n-gram statistics stay realistic (word salad would destroy the
  bigram/winnowing behaviour the lake exists to exercise) while
  whole docs stay globally unique — a crawl is mostly unique text,
  not 500 near-copies of everything (the scale_probe 10x lake is
  deliberately that; this lake is deliberately not).
- Languages cycle en-weighted (6 en : 1 de : 1 es : 1 fr per 9 docs)
  so the langid evaluation has all classes.
- A bounded planted tail rides inside, built from the named
  constants so tests can assert recovery instead of hand-counting:
  every doc with ``i % 50 == 7`` embeds ``LINCOLN_QUOTE`` verbatim,
  ``i % 50 == 23`` embeds ``MELVILLE_QUOTE``, and ``i % 100 == 41``
  is an EXACT duplicate of doc ``i-1`` (same text, new id) — ~2%
  quotation incidence and ~1% exact-dup incidence.

The lake is built once per path and fingerprinted: a content md5
over (doc_id, text) is written alongside and re-checked on reuse, so
a stale /tmp artifact from an older protocol can't silently feed the
bench. Only ``documents.parquet`` is generated; the other nine
tables are linked from a donor lake so ``load_table`` callers stay
satisfied.
"""

from __future__ import annotations

import hashlib
import os
import random
import tempfile

from ..catalog import link_donor_tables
from .prose import LINCOLN_QUOTE, MELVILLE_QUOTE, PROSE

#: protocol version — bump to invalidate cached lakes on any change
#: to the generation code below
_PROTOCOL = "prose-lake-v1"

N_DOCS = 5000


def _default_lake_dir() -> str:
    """Per-user, env-overridable lake location (ADVICE r11 #2): a
    fixed world-shared /tmp/prose-lake lets any local user pre-create
    or tamper with the predictable path and feed both engines
    attacker-controlled data. Keyed on UID so concurrent users never
    collide; SPARK_GRAFT_PROSE_LAKE_DIR overrides for CI layouts."""
    env = os.environ.get("SPARK_GRAFT_PROSE_LAKE_DIR")
    if env:
        return env
    uid = os.getuid() if hasattr(os, "getuid") else "u"
    return os.path.join(tempfile.gettempdir(), f"prose-lake-{uid}")


def _words_by_lang() -> dict[str, list[list[str]]]:
    by_lang: dict[str, list[list[str]]] = {}
    for _i, lang, _title, text in PROSE:
        by_lang.setdefault(lang, []).append(text.split())
    return by_lang


_LANG_CYCLE = ["en", "en", "en", "de", "en", "es", "en", "fr", "en"]


def _doc_text(i: int, by_lang: dict[str, list[list[str]]]) -> tuple[str, str]:
    """(lang, text) for doc index i — deterministic in i alone."""
    rng = random.Random(i)
    lang = _LANG_CYCLE[i % len(_LANG_CYCLE)]
    paras = by_lang[lang]
    pieces: list[str] = []
    n_chars = 0
    target = rng.randint(180, 420)
    while n_chars < target:
        words = paras[rng.randrange(len(paras))]
        w = rng.randint(5, 12)
        start = rng.randrange(max(1, len(words) - w))
        chunk = " ".join(words[start : start + w])
        pieces.append(chunk)
        n_chars += len(chunk) + 1
    if i % 50 == 7:
        pieces.insert(len(pieces) // 2, LINCOLN_QUOTE)
    elif i % 50 == 23:
        pieces.insert(len(pieces) // 2, MELVILLE_QUOTE)
    return lang, " ".join(pieces)


def _rows() -> list[tuple[int, str, str, str, int]]:
    by_lang = _words_by_lang()
    rows: list[tuple[int, str, str, str, int]] = []
    prev_text, prev_lang = "", "en"
    for i in range(1, N_DOCS + 1):
        if i % 100 == 41 and prev_text:
            lang, text = prev_lang, prev_text  # exact duplicate, new id
        else:
            lang, text = _doc_text(i, by_lang)
        rows.append((i, text, lang, f"prose_{lang}", len(text)))
        prev_text, prev_lang = text, lang
    return rows


def _fingerprint(rows: list[tuple[int, str, str, str, int]]) -> str:
    h = hashlib.md5(_PROTOCOL.encode())
    for r in rows:
        h.update(f"{r[0]}\x00{r[1]}\x01".encode())
    return h.hexdigest()


def prose_lake_dir(link_from: str | None, out_dir: str | None = None) -> str:
    """Build (or reuse, fingerprint-checked) the prose lake; link the
    nine non-document tables from ``link_from`` (``None`` skips the
    donor linking — enough for callers that read only documents,
    e.g. the import-time pre-build below). ``out_dir`` defaults to
    the per-user ``_default_lake_dir()``. Rebuilds are atomic:
    parquet and stamp are written to same-directory temp names and
    ``os.replace``d, so a concurrent oracle read (DuckDB in the
    driver's gate) never sees a half-written file — it sees the old
    complete lake or the new complete lake (ADVICE r11 #2)."""
    out_dir = out_dir or _default_lake_dir()
    rows = _rows()
    fp = _fingerprint(rows)
    stamp = os.path.join(out_dir, ".fingerprint")
    doc_path = os.path.join(out_dir, "documents.parquet")
    os.makedirs(out_dir, exist_ok=True)
    stale = not (
        os.path.exists(doc_path)
        and os.path.exists(stamp)
        and open(stamp).read().strip() == fp
    )
    if stale:
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
                "n_chars": pa.array([r[4] for r in rows], pa.int64()),
            }
        )
        # write-to-temp + atomic rename, parquet before stamp: a crash
        # in between leaves a mismatched stamp -> next call rebuilds
        tmp_doc = doc_path + f".tmp.{os.getpid()}"
        pq.write_table(table, tmp_doc)
        os.replace(tmp_doc, doc_path)
        tmp_stamp = stamp + f".tmp.{os.getpid()}"
        with open(tmp_stamp, "w") as f:
            f.write(fp)
        os.replace(tmp_stamp, stamp)
    if link_from is not None:
        link_donor_tables(link_from, out_dir, exclude={"documents.parquet"})
    return out_dir


# --- oracle-paired registry twins (VERDICT r10 ask #2) ------------------------
#
# The three prose-lake bench entries were timed in BENCH_FULL.json but
# not hash-gated: register them as first-class queries so everything
# the bench times has a green CORRECTNESS row and the plan-pin top-N
# derivation never has to name-filter them away. Each spark fn builds
# (or fingerprint-reuses) the lake itself; the oracle re-targets the
# UNDERLYING query's SQL at the lake parquet via a FROM-swap, so both
# engines read the identical file and the SQL semantics stay
# byte-for-byte those of the already-green synthetic-lake twin.

#: absolute so the DuckDB oracle resolves it regardless of cwd; the
#: per-user default (or the env override) is baked into the oracle
#: SQL at registration time, so both engines resolve the same file
#: within a process lifetime
_LAKE_DOCS = os.path.join(_default_lake_dir(), "documents.parquet")


def _on_lake(sql: str) -> str:
    assert sql.count("FROM documents") == 1, "FROM-swap needs one site"
    return sql.replace(
        "FROM documents", f"FROM read_parquet('{_LAKE_DOCS}')"
    )


def _register_lake_queries() -> None:
    from ..queries import register
    from .breadth10 import _LANGID_EVAL_ORACLE
    from .breadth14 import _DUP_SPAN_ORACLE, _WINNOW_PAIRS_ORACLE

    @register(
        "proselake_winnow_overlap_pairs", _on_lake(_WINNOW_PAIRS_ORACLE)
    )
    def q_proselake_winnow(spark, sf_dir: str):
        """winnow_overlap_pairs (suites/breadth14.py) on the
        real-prose lake — identical k=16/window=8 parameters, genuine
        multi-language vocabulary instead of the synthetic
        small-vocab documents table."""
        from .breadth14 import q_winnow_overlap_pairs

        return q_winnow_overlap_pairs(spark, prose_lake_dir(sf_dir))

    @register("proselake_doc_dup_span_stats", _on_lake(_DUP_SPAN_ORACLE))
    def q_proselake_dup_span(spark, sf_dir: str):
        """doc_dup_span_stats (suites/breadth14.py) on the real-prose
        lake — the planted ~1% exact-dup / ~2% quotation tail gives
        the span merger real work at realistic vocabulary."""
        from .breadth14 import q_doc_dup_span_stats

        return q_doc_dup_span_stats(spark, prose_lake_dir(sf_dir))

    @register("proselake_langid_eval_metrics", _on_lake(_LANGID_EVAL_ORACLE))
    def q_proselake_langid(spark, sf_dir: str):
        """langid_eval_metrics (suites/breadth10.py) on the
        real-prose lake — precision/recall/F1 of the stopword
        language-ID against the lake's gold lang column."""
        from .breadth10 import q_langid_eval_metrics

        return q_langid_eval_metrics(spark, prose_lake_dir(sf_dir))

    # Pre-build the lake parquet NOW (documents only, no donor links —
    # the spark fns re-link with the real sf_dir at call time): the
    # driver may run an oracle before its spark twin, and the oracle
    # can only read a file that exists. Fingerprint-cached, ~0.5s.
    # A failed build leaves the queries registered: the spark side
    # retries (and raises meaningfully) at call time.
    try:
        prose_lake_dir(None)
    except Exception:  # noqa: BLE001 — never break registry loading
        pass


_register_lake_queries()
