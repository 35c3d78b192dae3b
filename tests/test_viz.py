"""Plot-artifact rendering on real (oracle-verified) query outputs."""

from __future__ import annotations

from pyspark_retention_pipeline_spark.registry import all_queries


def test_threshold_curve_artifact(spark, sf_dir, tmp_path):
    from pyspark_retention_pipeline_spark.viz import render_threshold_curve

    rows = [r.asDict() for r in all_queries()["threshold_curve"](spark, sf_dir).collect()]
    best = max(rows, key=lambda r: (r["f1"], -r["t"]))["t"]
    out = str(tmp_path / "threshold_curve.png")
    written = render_threshold_curve(rows, out, best_threshold=best)
    content = open(written).read() if written.endswith(".svg") else ""
    if written.endswith(".svg"):
        assert content.count("<polyline") == 3  # f1 / precision / recall
        assert "best =" in content and "stroke-dasharray" in content
        assert "Threshold Optimization Curve" in content


def test_feature_importance_artifact(spark, sf_dir, tmp_path):
    from pyspark_retention_pipeline_spark.ml import coefficients_frame, train_churn_model
    from pyspark_retention_pipeline_spark.operators.retention import churn_feature_frame
    from pyspark_retention_pipeline_spark.viz import render_feature_importance

    model = train_churn_model(churn_feature_frame(spark, sf_dir))
    rows = [r.asDict() for r in coefficients_frame(spark, model).collect()]
    out = str(tmp_path / "feature_importance.png")
    written = render_feature_importance(rows, out)
    if written.endswith(".svg"):
        content = open(written).read()
        assert content.count("<rect") == len(rows) + 1  # bars + background
        for r in rows:
            assert r["feature"] in content


def test_signed_bar_colors():
    from pyspark_retention_pipeline_spark.viz import feature_importance_svg

    svg = feature_importance_svg(
        [
            {"feature": "up_risk", "coefficient": 0.8},
            {"feature": "down_risk", "coefficient": -0.4},
        ],
        "/tmp/claude-0/viz_test.svg",
    )
    assert '#d62728' in svg and '#1f77b4' in svg  # sign-aware colors


def test_feature_importance_empty_rows(tmp_path):
    """An empty coefficient list renders an empty chart instead of raising
    ValueError from max() on an empty generator (round-2 advisor finding)."""
    from pyspark_retention_pipeline_spark.viz import feature_importance_svg

    svg = feature_importance_svg([], str(tmp_path / "fi.svg"))
    assert svg.startswith("<svg")
    assert (tmp_path / "fi.svg").exists()
