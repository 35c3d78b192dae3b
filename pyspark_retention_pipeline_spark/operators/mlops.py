"""ML-tier queries (SURVEY.md §2.11) — rows-only correctness checks.

Model outputs have no SQL oracle (VectorUDT / iterative optimization are not
SQL-expressible — SURVEY §7 risk register), so these register without oracle
SQL; the driver records row-count/schema stability and the pytest suite pins
seeded metric bands instead (tests/test_ml.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from .retention import churn_feature_frame


# One training per (session, sf_dir): the four ML queries share the fitted
# model instead of re-training per query (matters for the driver's
# correctness sweep, which calls each query independently). Keyed by the
# session's applicationId — stable for a session's lifetime and never reused
# by a successor session, unlike id(spark), which a new SparkSession object
# can legitimately land on after the old one is garbage-collected and would
# then be served DataFrames bound to a dead SparkContext (round-1 advisor
# finding).
_MODEL_CACHE: dict[tuple[str, str], tuple] = {}


def _train(spark: SparkSession, sf_dir: str):
    from ..ml import train_churn_model

    app_id = spark.sparkContext.applicationId
    # Evict entries from other applications: a long-lived process that
    # creates successive SparkSessions would otherwise accumulate models and
    # cached DataFrames bound to stopped contexts indefinitely (round-2
    # advisor finding). Only the current session's entries can ever be
    # served, so dropping the rest loses nothing.
    stale = [k for k in _MODEL_CACHE if k[0] != app_id]
    for k in stale:
        del _MODEL_CACHE[k]
    key = (app_id, sf_dir)
    if key not in _MODEL_CACHE:
        features = churn_feature_frame(spark, sf_dir).cache()
        _MODEL_CACHE[key] = (train_churn_model(features), features)
    return _MODEL_CACHE[key]


@query("ml_churn_scores", tags=("M11", "ml"))
def ml_churn_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the weighted LR churn pipeline on the feature table and score it
    (batch inference, reference ``eval.py:50-55``)."""
    from ..ml import score_frame

    model, features = _train(spark, sf_dir)
    return score_frame(model, features)


@query("ml_churn_coefficients", tags=("M10", "ml"))
def ml_churn_coefficients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked signed coefficients of the fitted model (reference
    ``train.py:110-122``)."""
    from ..ml import coefficients_frame

    model, _ = _train(spark, sf_dir)
    return coefficients_frame(spark, model)


@query("ml_churn_metrics", tags=("M8", "ml"))
def ml_churn_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC-ROC / AUC-PR of the fitted model as a tidy frame."""
    from ..ml import evaluate_model

    model, features = _train(spark, sf_dir)
    metrics = evaluate_model(model, features)
    schema = T.StructType(
        [T.StructField("metric", T.StringType()), T.StructField("value", T.DoubleType())]
    )
    return spark.createDataFrame(sorted(metrics.items()), schema)


@query("ml_threshold_from_scores", tags=("M9", "ml"))
def ml_threshold_from_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best F1 threshold over *real* model scores using the single-pass sweep
    operator — the fusion of the ML tier with operators/threshold.py (the
    reference's 303-job sweep collapsed into one aggregation)."""
    from ..ml import score_frame
    from .threshold import _with_metrics, sweep_scores

    model, features = _train(spark, sf_dir)
    scored = score_frame(model, features).select(
        F.col("label"), F.col("p_churn").alias("score")
    )
    return (
        _with_metrics(sweep_scores(scored))
        .select("t", "precision", "recall", "f1")
        .orderBy(F.col("f1").desc(), F.col("t").asc())
        .limit(1)
    )
