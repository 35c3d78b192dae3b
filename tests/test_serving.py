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
    # required_features is the reference response contract (serve_api.py:190);
    # asserting it here keeps the key pinned even where fastapi is absent
    # and the route-level test skips.
    assert scorer.schema()["required_features"] == FEATURE_COLS
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


def test_coercion_rules_pinned(scorer):
    """Reference serve_api.py:122-130: missing feature -> 0.0, unknown key
    dropped, un-floatable value -> 0.0. Pinned by score equivalence: all four
    payloads must produce the IDENTICAL probability."""
    explicit_zero = {c: 0.0 for c in FEATURE_COLS}
    payloads = [
        explicit_zero,                                  # baseline
        {},                                             # all missing -> 0.0
        {"definitely_unknown_key": 123.4},              # unknown dropped
        {FEATURE_COLS[0]: "not-a-number"},              # un-floatable -> 0.0
        {FEATURE_COLS[0]: None},                        # null -> 0.0
    ]
    out = scorer.predict(payloads)
    probs = {round(r["probability"], 12) for r in out}
    assert len(probs) == 1, f"coercion rules diverged: {probs}"
    # And a string that IS floatable must coerce to its numeric value.
    as_str = scorer.predict([{c: "1.0" for c in FEATURE_COLS}])
    as_num = scorer.predict([{c: 1.0 for c in FEATURE_COLS}])
    assert round(as_str[0]["probability"], 12) == round(as_num[0]["probability"], 12)


# --- HTTP route layer (reference serve_api.py:177-221) --------------------
# Exercised with TestClient when FastAPI is importable; the fixture skips
# just the route tests cleanly in this container (importorskip at module
# level would skip the scorer-level tests above too).


@pytest.fixture(scope="module")
def client(scorer):
    pytest.importorskip("fastapi", reason="fastapi not in this container")
    from fastapi.testclient import TestClient

    return TestClient(create_app(scorer))


def test_route_health_and_schema(client, scorer):
    h = client.get("/health").json()
    assert h["status"] == "ok" and h["features"] == FEATURE_COLS
    s = client.get("/schema").json()
    # required_features is the reference contract (serve_api.py:190).
    assert s["required_features"] == FEATURE_COLS
    assert s["features"] == FEATURE_COLS and s["threshold"] == scorer.threshold


def test_route_predict_single(client):
    r = client.post("/predict", json={"features": {"total_orders": 3.0}})
    assert r.status_code == 200
    body = r.json()
    assert body["n"] == 1 and len(body["results"]) == 1
    assert 0.0 <= body["results"][0]["probability"] <= 1.0


def test_route_predict_batch_and_empty(client):
    r = client.post(
        "/predict_batch",
        json={"items": [{"features": {}}, {"features": {"recency_days": 9.0}}]},
    )
    assert r.status_code == 200 and r.json()["n"] == 2
    empty = client.post("/predict_batch", json={"items": []})
    assert empty.status_code == 200 and empty.json()["n"] == 0


def test_route_missing_features_is_422(client):
    # Reference parity: pydantic-validated payloads — no silent defaults.
    assert client.post("/predict", json={}).status_code == 422
    assert client.post("/predict_batch", json={"items": [{}]}).status_code == 422
