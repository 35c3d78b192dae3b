"""End-to-end lifecycle: ETL → splits → train → eval → artifacts (the
reference's make etl/train/eval flow on the star-schema testdata)."""

from __future__ import annotations

import json
import os

from pyspark_retention_pipeline_spark.ml.workflow import (
    run_eval,
    run_feature_etl,
    run_training,
)


def test_full_lifecycle(spark, sf_dir, tmp_path):
    out = str(tmp_path / "artifacts")

    counts = run_feature_etl(spark, sf_dir, out)
    assert set(counts) == {"train", "val", "test"}
    assert all(n > 0 for n in counts.values())
    for artifact in ("features", "train", "val", "test"):
        assert os.path.isdir(os.path.join(out, artifact))

    metrics = run_training(spark, out)
    assert 0.0 <= metrics["areaUnderROC"] <= 1.0
    assert 0.0 <= metrics["best_threshold"] <= 1.0
    assert os.path.isfile(os.path.join(out, "metrics.json"))
    assert os.path.isfile(os.path.join(out, "coefficients.csv"))
    assert os.path.isdir(os.path.join(out, "model"))
    with open(os.path.join(out, "metrics.json")) as f:
        persisted = json.load(f)
    assert persisted["best_threshold"] == metrics["best_threshold"]

    test_metrics = run_eval(spark, out)
    n_test = counts["test"]
    assert test_metrics["tp"] + test_metrics["fp"] + test_metrics["fn"] + test_metrics["tn"] == n_test
    assert test_metrics["threshold"] == metrics["best_threshold"]


def test_split_determinism(spark, sf_dir, tmp_path):
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    c1 = run_feature_etl(spark, sf_dir, out1)
    c2 = run_feature_etl(spark, sf_dir, out2)
    # Seeded randomSplit: same sizes on re-run (SURVEY §7: assert sizes and
    # disjointness, not exact membership).
    assert c1 == c2
    train = spark.read.parquet(os.path.join(out1, "train")).select("custkey")
    val = spark.read.parquet(os.path.join(out1, "val")).select("custkey")
    assert train.intersect(val).count() == 0
