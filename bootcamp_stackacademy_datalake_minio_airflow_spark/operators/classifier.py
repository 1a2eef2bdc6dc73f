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
