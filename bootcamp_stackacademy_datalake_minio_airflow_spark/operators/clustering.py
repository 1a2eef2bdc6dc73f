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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: hard ceiling on the codebook collect — k*dim rows, not corpus rows
_MAX_CODEBOOK_CELLS = 65536


def _dot_lit(vec_col, centroid: list[float]):
    """v · c for a literal centroid, as a left-to-right JVM fold."""
    arr = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec_col, arr, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign_expr(vec_col, vv, centroids: dict[int, list[float]]):
    """(cluster_id, rounded-d²) of the nearest centroid.

    d² = v·v − 2·v·c + c·c, rounded to 4 before the argmin; ties go to
    the smaller centroid id via struct ordering (the oracle's
    ``ROW_NUMBER() ... ORDER BY d2r, cid`` twin).
    """
    cands = []
    for cid in sorted(centroids):
        c = centroids[cid]
        cc = 0.0
        for x in c:  # plain left-to-right sum: mirrors list_inner_product
            cc += float(x) * float(x)
        d2 = vv - 2.0 * _dot_lit(vec_col, c) + F.lit(cc)
        cands.append(
            F.struct(F.round(d2, 4).alias("d"), F.lit(cid).alias("c"))
        )
    # F.least requires >= 2 columns; a single surviving centroid (all
    # points in one cluster, or k=1) is a legitimate state — every
    # point trivially assigns to it
    best = cands[0] if len(cands) == 1 else F.least(*cands)
    return best.getField("c"), best.getField("d")


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
    base = (
        df.filter(F.col(vec_col).isNotNull() & (F.size(vec_col) == dim))
        .select(
            F.col(id_col).alias("__id"),
            vec.alias("__v"),
            F.aggregate(
                F.zip_with(vec, vec, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("__vv"),
        )
    )

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
        cid, _d = _assign_expr(F.col("__v"), F.col("__vv"), centroids)
        assigned = base.select("__id", "__v", "__vv", cid.alias("__c"))
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

    cid, d2r = _assign_expr(F.col("__v"), F.col("__vv"), centroids)
    return (
        base.select(cid.alias("cluster_id"), d2r.alias("__d"))
        .groupBy("cluster_id")
        .agg(
            F.count("*").cast("long").alias("n_points"),
            F.round(F.sum("__d"), 2).alias("inertia"),
        )
    )
