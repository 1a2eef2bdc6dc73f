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


def dp_noisy_counts(
    df,
    group_col: str,
    *,
    epsilon: float = 1.0,
    salt: str = "dp",
    include_true: bool = False,
):
    """Laplace-mechanism count release per group: count + Lap(1/ε)
    noise, the standard differentially-private aggregate release.

    HONESTY NOTE: the noise draw here is a DETERMINISTIC function of
    the group key (md5 uniform → inverse-CDF Laplace), which makes the
    release replayable by the cross-engine oracle but does NOT provide
    real DP guarantees — a seeded draw is predictable, and re-running
    never refreshes the noise. The MECHANISM (sensitivity-1 count +
    Laplace(1/ε), inverse-CDF transform) is exactly production shape;
    swap the seeded uniform for a secure RNG to get the guarantee.

    ``include_true`` keeps the exact count alongside the noisy one —
    for the verification/audit path ONLY. The default release schema
    deliberately omits it: publishing true_n next to noisy_n makes
    epsilon infinite no matter how good the noise is (review finding).

    Plan: one map-side-combined count aggregation; the noise is pure
    codegen math on the |groups|-row result.
    """
    from .sampling import _PREFIX_SPACE, _draw

    counts = df.groupBy(group_col).agg(F.count("*").cast("long").alias("true_n"))
    # NULL group keys still deserve a noisy count: md5(NULL) is NULL
    # and would otherwise leak the exact count with NULL noise —
    # draw from a sentinel the cast can never produce
    draw_key = F.coalesce(F.col(group_col).cast("string"), F.lit("\x00null"))
    u_int = F.conv(_draw(draw_key, salt), 16, 10).cast("long")
    # u in (0, 1), strictly: +0.5 keeps the inverse CDF finite
    u = (u_int + F.lit(0.5)) / F.lit(float(_PREFIX_SPACE))
    b = 1.0 / epsilon
    centered = u - F.lit(0.5)
    lap = (
        -F.lit(b)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    cols = [group_col]
    if include_true:
        cols.append("true_n")
    return counts.select(
        *cols, F.round(F.col("true_n") + lap, 4).alias("noisy_n")
    )


def k_anonymity_violations(
    df,
    quasi_cols: list[str],
    *,
    k: int = 5,
):
    """Quasi-identifier groups smaller than ``k`` — the k-anonymity
    audit run before releasing a dataset (any group below k re-
    identifies its members by the quasi-identifier combination alone).

    Emits (quasi columns..., group_n) for violating groups. One
    map-side-combined aggregation; NULL quasi-values form their own
    groups (a NULL combination is just as identifying).
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").cast("long").alias("group_n"))
        .filter(F.col("group_n") < k)
    )
