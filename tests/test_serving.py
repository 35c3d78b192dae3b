"""Serving tier (reference serve_api parity): model-as-schema-authority,
payload coercion, thresholded output, optional HTTP wrapper gating."""

from __future__ import annotations

import pytest

from pyspark_retention_pipeline_spark.ml import FEATURE_COLS, train_churn_model
from pyspark_retention_pipeline_spark.operators.retention import churn_feature_frame
from pyspark_retention_pipeline_spark.serving import ChurnScorer, create_app


@pytest.fixture(scope="module")
def scorer(spark, sf_dir):
    model = train_churn_model(churn_feature_frame(spark, sf_dir))
    return ChurnScorer(spark, model, threshold=0.46)


def test_schema_comes_from_model(scorer):
    assert scorer.schema()["features"] == FEATURE_COLS
    assert scorer.schema()["threshold"] == 0.46
    assert scorer.health()["status"] == "ok"


def test_predict_single_and_batch(scorer):
    out = scorer.predict([{"total_orders": 3.0, "recency_days": 200.0}])
    assert len(out) == 1
    assert 0.0 <= out[0]["probability"] <= 1.0
    assert out[0]["prediction"] in (0.0, 1.0)

    batch = scorer.predict(
        [{c: 1.0 for c in FEATURE_COLS}, {"unknown_key": 9.9}, {}]
    )
    assert len(batch) == 3


def test_threshold_applies(scorer):
    out = scorer.predict([{c: 0.0 for c in FEATURE_COLS}])
    p = out[0]["probability"]
    assert out[0]["prediction"] == (1.0 if p >= 0.46 else 0.0)


def test_http_wrapper_gated(scorer):
    # FastAPI is absent in this container: the wrapper must fail loudly and
    # name the fix, leaving the library path usable.
    try:
        import fastapi  # noqa: F401

        app = create_app(scorer)
        assert app is not None
    except ImportError:
        with pytest.raises(ImportError, match="fastapi"):
            create_app(scorer)
