"""ML tier — pipeline parity with the reference (stage shapes, class
weighting, serving-path coercion) plus seeded sanity bands."""

from __future__ import annotations

import pytest

from pyspark_retention_pipeline_spark.ml import (
    FEATURE_COLS,
    add_class_weight,
    coefficients_frame,
    evaluate_model,
    score_frame,
    score_records,
    train_churn_model,
)
from pyspark_retention_pipeline_spark.operators.retention import churn_feature_frame


@pytest.fixture(scope="module")
def features(spark, sf_dir):
    return churn_feature_frame(spark, sf_dir).cache()


@pytest.fixture(scope="module")
def model(features):
    return train_churn_model(features)


def test_class_weight_balances(features):
    w = add_class_weight(features)
    rows = {r["label"]: r for r in w.groupBy("label").avg("class_weight").collect()}
    assert rows[0.0]["avg(class_weight)"] == 1.0
    counts = {r["label"]: r["count"] for r in features.groupBy("label").count().collect()}
    expected = counts[0.0] / counts[1.0]
    assert abs(rows[1.0]["avg(class_weight)"] - expected) < 1e-9


def test_model_scores_are_probabilities(model, features):
    scored = score_frame(model, features)
    stats = scored.selectExpr(
        "min(p_churn) AS lo", "max(p_churn) AS hi", "count(*) AS n"
    ).collect()[0]
    assert 0.0 <= stats["lo"] <= stats["hi"] <= 1.0
    assert stats["n"] == features.count()


def test_model_beats_random(model, features):
    # The engineered features genuinely predict the seeded churn pattern.
    metrics = evaluate_model(model, features)
    assert metrics["areaUnderROC"] > 0.55, metrics


def test_coefficients_one_per_feature(spark, model):
    coefs = coefficients_frame(spark, model).collect()
    assert len(coefs) == len(FEATURE_COLS)
    assert {r["feature"] for r in coefs} == set(FEATURE_COLS)


def test_serving_coercion(spark, model):
    # Missing features -> 0.0; unknown keys dropped (reference serve_api.py).
    out = score_records(
        spark,
        model,
        [
            {"total_orders": 5, "recency_days": 10, "unknown_key": 123},
            {c: 1.0 for c in FEATURE_COLS},
        ],
    ).collect()
    assert len(out) == 2
    for r in out:
        assert 0.0 <= r["p_churn"] <= 1.0
        assert r["prediction"] in (0.0, 1.0)
