"""Z-order (Morton-curve) clustering for multi-dimensional data
skipping — the OPTIMIZE ZORDER counterpart for a plain-parquet lake.

Sorting a table by one column gives perfect file-level min/max
pruning on that column and none on any other. Interleaving the bits
of several columns' bucketized values produces a space-filling curve
where rows close in EVERY dimension land in the same files, so
parquet footer min/max statistics prune scans filtered on ANY of the
z-ordered columns. This is layout work, not a query operator: pay one
range-partitioned write, and every later selective scan reads fewer
files.

Scale notes (100 TB posture):
- Bucket bounds come from one distributed min/max aggregate per
  column (a single scalar row to the driver — never data).
- The write is ``repartitionByRange`` on the z-value (sampled range
  partitioner, balanced output files) + ``sortWithinPartitions`` so
  each file covers a compact z-range.
- The z-value itself is pure integer bit arithmetic (codegen, no
  UDFs), built as one SQL string to avoid py4j expression-tree
  round-trips.

The bit-interleave math is engine-portable (shift/and/or on BIGINT),
so a DuckDB oracle can replicate z-values bit-for-bit given the same
min/max bounds — see suites/breadth6.py:q_zorder_orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketize_sql(col: str, lo: float, hi: float, bits: int) -> str:
    """SQL expression mapping ``col`` linearly into [0, 2^bits) as a
    BIGINT bucket. Degenerate ranges (lo == hi) collapse to bucket 0.

    The float math is plain IEEE754 double arithmetic in a fixed
    expression shape, so any engine evaluates it to the identical
    bucket — which is what makes the z-value oracle-checkable. The
    bounds are embedded as CAST('<repr>' AS DOUBLE): a bare decimal
    literal would parse as DECIMAL in Spark SQL (different rounding
    than DuckDB's double math), while repr() round-trips the exact
    IEEE value through the string.
    """
    n = (1 << bits) - 1
    if hi == lo:
        return "CAST(0 AS BIGINT)"
    lo_d = f"CAST('{lo!r}' AS DOUBLE)"
    hi_d = f"CAST('{hi!r}' AS DOUBLE)"
    return (
        f"CAST(LEAST({n}, GREATEST(0, "
        f"CAST(FLOOR((CAST({col} AS DOUBLE) - {lo_d}) * {n}"
        f" / ({hi_d} - {lo_d})) AS BIGINT))) AS BIGINT)"
    )


def interleave_sql(bucket_exprs: list[str], bits: int) -> str:
    """SQL expression interleaving the low ``bits`` bits of each
    bucket expression into one Morton code (column i contributes bit
    j to output position j*len(cols)+i).

    The code must fit the 63 value bits of a signed BIGINT: Spark
    masks shift amounts mod 64 (positions >= 64 would silently
    collide lanes) and bit 63 is the sign (negative z-values would
    sort before everything in repartitionByRange) — so over-wide
    requests are an error, not a corruption.
    """
    k = len(bucket_exprs)
    if k * bits > 63:
        raise ValueError(
            f"{k} columns x {bits} bits = {k * bits} code bits; max 63. "
            f"Use bits <= {63 // k} for {k} columns."
        )
    terms = []
    for i, be in enumerate(bucket_exprs):
        for j in range(bits):
            terms.append(f"shiftleft(shiftrightunsigned({be}, {j}) & 1, {j * k + i})")
    return "(" + " | ".join(terms) + ")"


def column_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """One distributed aggregate returning (min, max) per column —
    the only driver-side data this module ever holds."""
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"__lo_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"__hi_{c}"))
    row = df.agg(*aggs).collect()[0]
    return {c: (row[f"__lo_{c}"], row[f"__hi_{c}"]) for c in cols}


def zorder_value(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    bounds: dict[str, tuple[float, float]] | None = None,
    out_col: str = "__z",
) -> DataFrame:
    """Append the Morton z-value of ``cols`` as ``out_col``.

    ``bounds`` may be passed explicitly (e.g. from a previous day's
    profile) to keep z-values stable across incremental writes;
    otherwise they are computed with one aggregate. ``bits`` is
    auto-reduced so the code fits a BIGINT's 63 value bits — per-axis
    resolution, not correctness, is what shrinks with more columns.
    """
    bits = min(bits, 63 // len(cols))
    bounds = bounds or column_bounds(df, cols)
    buckets = [bucketize_sql(c, *bounds[c], bits) for c in cols]
    return df.withColumn(out_col, F.expr(interleave_sql(buckets, bits)))


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits: int = 16,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the z-order curve of
    ``cols``: range-partition by z-value into ``n_files`` balanced
    output partitions, sort within each, drop the helper column.

    Each output file then covers a compact hyper-rectangle of the
    value space, so parquet min/max footer stats prune selective
    scans on any of ``cols``.
    """
    zdf = zorder_value(df, cols, bits=bits, bounds=bounds)
    (
        zdf.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
