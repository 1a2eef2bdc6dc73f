"""Seeded Lloyd k-means over an embedding column — the oracle-gated
twin of the MLlib coarse quantizer in ``operators/similarity.py``
(``ivf_index`` trains ``pyspark.ml.clustering.KMeans``; its iterations
are not ANSI-SQL-replayable, so this module carries the deterministic
Lloyd variant the DuckDB gate CAN replay end to end — the same
seeded-twin pattern as ``similarity.ivf_seeded_recall``).

Determinism contract (house rules, see suites/extensions.py):

- seeds are the ``k`` vectors with the smallest ``(md5(id), id)`` —
  the registry-wide seeded-selection convention;
- assignment argmin keys on ``ROUND(d², 4)`` with the centroid index
  as tie-break, so a last-ulp distance difference between engines
  cannot flip a cluster;
- re-estimated centroids are ``ROUND(avg, 6)`` per dimension BETWEEN
  iterations, so both engines enter iteration *t+1* with bit-identical
  centroid state (the residual risk is an avg landing exactly on a
  half-1e-6 boundary — the registry-wide accepted residual);
- d² is the inner-product expansion ``v·v − 2·v·c + c·c`` on BOTH
  engines (DuckDB: ``list_inner_product``), not sqrt-then-square.

Scale shape: each Lloyd iteration is one map-side-combinable
aggregate — centroids travel TO the executors as literals (k×dim
doubles, kilobytes), and the only shuffle is ``k·dim`` partial means.
The sole ``collect()`` is the codebook (k×dim rows), which is
size-bounded by construction, never by the corpus. The reference has
no clustering at all (SURVEY §2 marks the category absent).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import fanout_repartition

#: hard ceiling on the codebook collect — k*dim rows, not corpus rows
_MAX_CODEBOOK_CELLS = 65536


def _dbl(x: float) -> str:
    """An exact IEEE-double SQL literal: repr() round-trips in Python
    and Double.parseDouble is correctly rounded, so the cast yields
    the identical bit pattern F.lit(float) would. Non-finite values
    are rejected loudly (ADVICE r12): repr renders them 'inf'/'nan',
    which Java's parseDouble (expecting 'Infinity'/'NaN') turns into
    NULL — a degenerate centroid would silently corrupt every
    distance expression instead of failing."""
    x = float(x)
    if not math.isfinite(x):
        raise ValueError(f"non-finite centroid coordinate: {x!r}")
    return f"CAST('{x!r}' AS DOUBLE)"


def _dot_sql(vec: str, centroid: list[float]) -> str:
    """v · c for a literal centroid as a left-to-right chain —
    ``((0.0 + v[0]*c0) + v[1]*c1) + ...`` — the exact fold order (and
    therefore the exact IEEE result) of the interpreted
    ``aggregate(zip_with(v, c, *), 0.0, +)`` form it replaces, but in
    whole-stage codegen and parsed ONCE as a SQL string instead of
    k·dim py4j Column calls (guide §4.1: prefer built-in expressions;
    interpreted HOF lambdas run row-at-a-time outside codegen —
    measured as the dominant cost of the Lloyd passes)."""
    acc = _dbl(0.0)
    for i, x in enumerate(centroid):
        acc = f"({acc} + ({vec}[{i}] * {_dbl(x)}))"
    return acc


def _assign_sql(vec: str, vv: str, centroids: dict[int, list[float]]):
    """SQL strings ``(cluster_expr, rounded-d² expr)`` of the nearest
    centroid. d² = v·v − 2·v·c + c·c, rounded to 4 before the argmin;
    ties go to the smaller centroid id via struct ordering (the
    oracle's ``ROW_NUMBER() ... ORDER BY d2r, cid`` twin)."""
    cands = []
    for cid in sorted(centroids):
        c = centroids[cid]
        cc = 0.0
        for x in c:  # plain left-to-right sum: mirrors list_inner_product
            cc += float(x) * float(x)
        d2 = f"(({vv} - ({_dbl(2.0)} * {_dot_sql(vec, c)})) + {_dbl(cc)})"
        cands.append(f"named_struct('d', round({d2}, 4), 'c', {cid})")
    # least() requires >= 2 args; a single surviving centroid (all
    # points in one cluster, or k=1) is a legitimate state — every
    # point trivially assigns to it
    best = cands[0] if len(cands) == 1 else f"least({', '.join(cands)})"
    return f"({best}).c", f"({best}).d"


def kmeans_lloyd_seeded(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 2,
    dim: int = 64,
) -> DataFrame:
    """Run ``n_iter`` Lloyd iterations from md5-seeded centroids and
    return per-cluster ``(cluster_id, n_points, inertia)``.

    inertia = ROUND(SUM(ROUND(d², 4)), 2) over the final assignment —
    both rounds mirrored by the oracle so the big float sum never
    decides the hash.
    """
    if k * dim > _MAX_CODEBOOK_CELLS:
        raise ValueError(
            f"codebook k*dim = {k * dim} exceeds the driver-side budget "
            f"{_MAX_CODEBOOK_CELLS}; shrink k or use MLlib KMeans "
            "(operators/similarity.ivf_index) for large codebooks"
        )
    spark = df.sparkSession
    vec = F.col(vec_col).cast("array<double>")
    # __vv as a codegen'd left-to-right chain (identical fold order —
    # and so identical IEEE doubles — to the interpreted
    # aggregate(zip_with(v, v, *)) form it replaces; see _dot_sql).
    # The frame is hash-repartitioned on the id and PERSISTED: the
    # seed pass, every Lloyd assignment/mean pass, and the final
    # report all re-read it (n_iter + 2 passes), and without the
    # exchange all of that per-row distance arithmetic runs inside
    # the scan stage — one task on a single-row-group parquet (guide
    # §2.5 repartition-after-read; §5 persist-on-reuse). Released via
    # the house materialize-release discipline below.
    vv_sql = _dbl(0.0)
    for i in range(dim):
        vv_sql = f"({vv_sql} + (__v[{i}] * __v[{i}]))"
    base = (
        df.filter(F.col(vec_col).isNotNull() & (F.size(vec_col) == dim))
        .select(F.col(id_col).alias("__id"), vec.alias("__v"))
        .transform(lambda d: fanout_repartition(d, "__id"))
        .selectExpr("__id", "__v", f"{vv_sql} AS __vv")
        .persist()
    )
    try:
        # seeds: k smallest (md5(id), id) — codebook-sized collect
        seed_rows = (
            base.select(
                "__id", "__v", F.md5(F.col("__id").cast("string")).alias("__h")
            )
            .orderBy("__h", "__id")
            .limit(k)
            .collect()
        )
        if not seed_rows:
            return spark.createDataFrame(
                [], "cluster_id INT, n_points BIGINT, inertia DOUBLE"
            )
        centroids = {i: list(r["__v"]) for i, r in enumerate(seed_rows)}

        for _ in range(n_iter):
            cid, _d = _assign_sql("__v", "__vv", centroids)
            assigned = base.selectExpr("__id", "__v", "__vv", f"{cid} AS __c")
            # one k*dim-cell aggregate; means rounded to 6 BETWEEN iterations
            mean_rows = (
                assigned.select("__c", F.posexplode("__v").alias("__i", "__x"))
                .groupBy("__c", "__i")
                .agg(F.round(F.avg("__x"), 6).alias("__m"))
                .collect()
            )
            nxt: dict[int, list[float]] = {}
            for r in mean_rows:
                nxt.setdefault(int(r["__c"]), [0.0] * dim)[int(r["__i"])] = float(
                    r["__m"]
                )
            centroids = nxt  # empty clusters drop out on BOTH engines

        cid, d2r = _assign_sql("__v", "__vv", centroids)
        out = (
            base.selectExpr(f"{cid} AS cluster_id", f"{d2r} AS __d")
            .groupBy("cluster_id")
            .agg(
                F.count("*").cast("long").alias("n_points"),
                F.round(F.sum("__d"), 2).alias("inertia"),
            )
        )
        from .dedup import _materialize_release

        return _materialize_release(out, base)
    finally:
        base.unpersist(blocking=False)
