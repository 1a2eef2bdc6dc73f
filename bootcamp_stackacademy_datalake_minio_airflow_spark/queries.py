"""Query registry: every implemented operator exposed as a named
(spark_fn, oracle_sql) pair for the driver's DuckDB correctness gate.

Contract (repo __spark_entry__.py): each spark_fn takes
``(spark, sf_dir)`` and returns a DataFrame; oracle_sql is equivalent
ANSI SQL DuckDB runs on the same parquet tables. Column names/aliases
match exactly on both sides (the driver sorts columns by name before
hashing). Aggregated/derived floats are ROUNDed identically on both
sides so float summation order cannot flip a hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

#: name -> (spark_fn, oracle_sql | None). None = non-SQL-expressible
#: (driver records a rows-only check).
REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn: SparkQuery) -> SparkQuery:
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


def queries() -> dict[str, SparkQuery]:
    _ensure_loaded()
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Parity (the reference's own pipeline, incl. the flagship) registers
    # FIRST so it always falls inside the driver's correctness window;
    # extension/no-oracle queries register last.
    from .suites import parity, breadth, breadth2, breadth3, extensions  # noqa: F401

    # Stable-partition: oracle-bearing queries before rows-only ones, so a
    # driver that checks a bounded prefix of the registry always sees every
    # hash-verifiable query first (rows-only checks are weaker anyway).
    ordered = sorted(REGISTRY.items(), key=lambda kv: kv[1][1] is None)
    REGISTRY.clear()
    REGISTRY.update(ordered)
    _LOADED = True
