"""Learned quality/topic classification over embedding columns via
Spark MLlib — the trainable counterpart of the rule-based scorers in
``operators/text.py`` and the nearest-centroid baseline in
``operators/similarity.py:centroid_classify``.

Why MLlib and not a Python loop: LogisticRegression trains JVM-side
with distributed L-BFGS (each iteration is one treeAggregate over the
partitions — gradient traffic is O(dim), never the data), and scoring
is a JVM transform, so both ends scale to corpus size without a
Python worker in the loop. ``array_to_vector`` converts the plain
``array<float>`` storage column to an ML vector without a UDF.

Typical pipeline use: hand-label (or weak-label) a small slice,
train, score the full corpus, and feed the score into
``jobs/curate.py``-style threshold filtering — the standard
model-based quality gate of LLM data curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_embedding_classifier(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    max_iter: int = 50,
    reg_param: float = 0.0,
):
    """Fit multinomial logistic regression on an embedding column.

    Returns the fitted ``LogisticRegressionModel`` (driver-held
    coefficient matrix of k x dim doubles — megabytes at most; the
    training data itself never leaves the executors).
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    prepared = df.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
        F.col(label_col).cast("double").alias("label"),
    )
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, family="multinomial"
    )
    return lr.fit(prepared)


def score_embeddings(
    model,
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Score a corpus with a fitted classifier: returns
    (id, predicted, confidence) where confidence is the winning
    class's probability. JVM transform end to end — the model
    broadcast is the only data movement.
    """
    from pyspark.ml.functions import array_to_vector, vector_to_array

    prepared = df.select(
        F.col(id_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    scored = model.transform(prepared)
    return scored.select(
        F.col(id_col),
        F.col("prediction").cast("long").alias("predicted"),
        F.round(F.array_max(vector_to_array("probability")), 6).alias("confidence"),
    )


# --- seeded full-batch GD twin (oracle-replayable) ---------------------------


def logreg_gd_train(
    df: DataFrame,
    label_col,
    feature_cols: list,
    lr: float = 0.5,
    n_steps: int = 3,
) -> DataFrame:
    """Full-batch gradient-descent logistic regression — the
    oracle-gated twin of ``train_embedding_classifier`` (MLlib L-BFGS
    is not ANSI-SQL-replayable; this seeded variant is, the same
    twin pattern as ``similarity.ivf_seeded_recall``).

    Determinism contract: weights start at 0, each step is ONE
    map-side-combinable aggregate (``SUM((p−y)·x_j)`` per feature +
    count), and updated weights are ``ROUND(w − lr·grad, 6)`` so both
    engines enter step *t+1* with bit-identical weight state. The
    features must already be exact cross-engine doubles (integer
    ratios ROUNDed at construction). The per-step driver traffic is
    one scalar row (1 + n_features doubles) — never data.

    Returns one row: ``n_docs``, one ``w_<name>`` per feature plus
    ``w_bias``, and ``accuracy`` of the sign rule ``w·x >= 0`` under
    the final weights (evaluated left-to-right on both engines, so
    the comparison sees the same double).
    """
    spark = df.sparkSession
    y = (label_col if not isinstance(label_col, str) else F.col(label_col)).cast(
        "double"
    )
    xs = [
        (c if not isinstance(c, str) else F.col(c)).cast("double")
        for c in feature_cols
    ]
    names = [
        c if isinstance(c, str) else c._jc.toString() for c in feature_cols
    ]
    feat = df.select(
        y.alias("__y"), *[xs[j].alias(f"__x{j}") for j in range(len(xs))]
    )

    w = [0.0] * (1 + len(xs))  # [bias, w1..wd]

    def _z(weights):
        z = F.lit(weights[0])
        for j in range(len(xs)):
            z = z + F.lit(weights[j + 1]) * F.col(f"__x{j}")
        return z

    for _ in range(n_steps):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(w)))
        aggs = [F.count("*").alias("__n"), F.sum(p - F.col("__y")).alias("__g0")]
        aggs += [
            F.sum((p - F.col("__y")) * F.col(f"__x{j}")).alias(f"__g{j + 1}")
            for j in range(len(xs))
        ]
        row = feat.agg(*aggs).collect()[0]  # one scalar row per step
        n = row["__n"]
        if not n:
            return spark.createDataFrame(
                [],
                "n_docs BIGINT, w_bias DOUBLE, "
                + ", ".join(f"w_{nm} DOUBLE" for nm in names)
                + ", accuracy DOUBLE",
            )
        # half-away-from-zero at 6 decimals — matches SQL ROUND(x, 6)
        # exactly (Python round() is half-even; see multimodal's
        # dyadic-boundary hash split, r8 ask #4 / ADVICE r9 #2)
        from .multimodal import _round_half_away6

        w = [
            _round_half_away6(w[j] - lr * (float(row[f"__g{j}"]) / n))
            for j in range(len(w))
        ]

    correct = (
        (_z(w) >= 0.0) == (F.col("__y") == 1.0)
    ).cast("int")
    return feat.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.sum(correct) / F.count("*"), 4).alias("accuracy"),
    ).select(
        "n_docs",
        F.lit(w[0]).alias("w_bias"),
        *[F.lit(w[j + 1]).alias(f"w_{names[j]}") for j in range(len(xs))],
        "accuracy",
    )
