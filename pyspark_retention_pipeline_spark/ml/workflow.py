"""End-to-end workflow parity: feature ETL → splits → train → eval → artifacts
(the reference's ``make etl`` / ``make train`` / ``make eval`` lifecycle,
SURVEY.md §3).

Scale fixes over the reference flagged in SURVEY §4:
  * the feature DAG is cached once before the four writes (the reference
    recomputes the whole DAG per write, ``etl.py:147-151``);
  * the threshold search is the single-pass sweep operator, not 303 jobs;
  * evaluation's confusion matrix is one conditional aggregation, not
    4 filter+count actions (``eval.py:74-82``).
"""

from __future__ import annotations

import json
import os

from pyspark.ml import PipelineModel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.retention import churn_feature_frame
from ..operators.threshold import _with_metrics
from .pipeline import (
    coefficients_frame,
    evaluate_model,
    score_frame,
    train_churn_model,
)

SPLIT_WEIGHTS = [0.7, 0.15, 0.15]
SEED = 42


def run_feature_etl(
    spark: SparkSession, sf_dir: str, out_dir: str, validate: bool = True
) -> dict[str, int]:
    """Build the churn feature table and persist features + train/val/test
    splits (reference ``etl.py:145-151``: randomSplit([0.7,0.15,0.15], 42)).

    With ``validate`` the feature frame must pass its data-quality contract
    (one fused aggregation pass) before anything is written — corrupt
    features fail the job instead of poisoning the model downstream.
    """
    from pyspark.sql import functions as F

    from ..quality import run_checks

    features = churn_feature_frame(spark, sf_dir).cache()
    if validate:
        results = run_checks(
            features,
            [
                ("custkey_not_null", F.col("custkey").isNull()),
                ("label_binary", ~F.col("label").isin(0.0, 1.0)),
                ("orders_positive", F.col("total_orders") <= 0),
                ("recency_not_null", F.col("recency_days").isNull()),
            ],
        )
        failed = [r for r in results if not r.passed]
        if failed:
            raise ValueError(f"feature quality contract violated: {failed}")
    features.write.mode("overwrite").parquet(os.path.join(out_dir, "features"))
    splits = features.randomSplit(SPLIT_WEIGHTS, seed=SEED)
    names = ("train", "val", "test")
    counts = {}
    for name, df in zip(names, splits):
        df.write.mode("overwrite").parquet(os.path.join(out_dir, name))
        counts[name] = df.count()
    features.unpersist()
    return counts


def _sweep_best_threshold(
    scored: DataFrame, thr_metric: str = "f1"
) -> dict[str, float]:
    """Single-pass 101-threshold sweep over real scores; ``thr_metric``
    mirrors the reference CLI's ``--thr_metric f1|recall|precision``
    (``train.py:58-102``) with its tie-break: strict ``>`` while iterating
    ascending thresholds keeps the LOWEST t at the max metric value."""
    if thr_metric not in ("f1", "recall", "precision"):
        raise ValueError(f"unknown thr_metric {thr_metric!r}")
    expanded = scored.select(
        "label", F.col("p_churn").alias("score"), F.explode(F.sequence(F.lit(0), F.lit(100))).alias("i")
    ).withColumn("t", F.col("i").cast("double") / F.lit(100.0))
    hit = F.col("score") >= F.col("t")
    pos = F.col("label") == 1
    sweep = expanded.groupBy("t").agg(
        F.sum(F.when(hit & pos, 1).otherwise(0)).alias("tp"),
        F.sum(F.when(hit & ~pos, 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~hit & pos, 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~hit & ~pos, 1).otherwise(0)).alias("tn"),
    )
    best = (
        _with_metrics(sweep)
        .orderBy(F.col(thr_metric).desc(), F.col("t").asc())
        .limit(1)
        .collect()[0]
    )
    return {
        "best_threshold": best["t"],
        "best_f1": best["f1"],
        "precision_at_best": best["precision"],
        "recall_at_best": best["recall"],
    }


def run_training(
    spark: SparkSession,
    out_dir: str,
    cross_validate: bool = False,
    cv_metric: str = "aucpr",
    thr_metric: str = "f1",
) -> dict[str, float]:
    """Train on the persisted train split, select threshold on val, persist
    model + metrics.json + coefficients.csv (reference ``train.py:137-192``).
    ``cv_metric``/``thr_metric`` mirror the reference CLI knobs
    (``--metric``, ``--thr_metric``) with the same defaults."""
    train = spark.read.parquet(os.path.join(out_dir, "train")).cache()
    val = spark.read.parquet(os.path.join(out_dir, "val")).cache()

    model = train_churn_model(
        train, cross_validate=cross_validate, seed=SEED, cv_metric=cv_metric
    )
    model.write().overwrite().save(os.path.join(out_dir, "model"))

    metrics = evaluate_model(model, val)
    scored_val = score_frame(model, val).cache()
    metrics.update(_sweep_best_threshold(scored_val, thr_metric=thr_metric))

    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2, sort_keys=True)
    coefficients_frame(spark, model).toPandas().to_csv(
        os.path.join(out_dir, "coefficients.csv"), index=False
    )
    return metrics


def run_plots(
    spark: SparkSession, out_dir: str, split: str = "val", plot_dir: str | None = None
) -> dict[str, str]:
    """Plot-artifact stage (reference ``plot_threshold.py:33-88`` and
    ``plot_feature_importance.py:63-71`` mains): load the persisted model
    and a split, sweep the REAL model scores with the single-pass operator
    (the reference loops 101 pandas passes driver-side,
    ``plot_threshold.py:16-30``), and write ``threshold_curve.csv`` +
    ``threshold_curve.png`` + ``feature_importance.png``. PNGs render via
    matplotlib when present, else the built-in raster encoder. Only the
    101-row curve and per-feature coefficients are collected — bounded
    artifact sinks."""
    from ..operators.threshold import sweep_scores
    from ..viz import render_feature_importance, render_threshold_curve

    plot_dir = plot_dir or os.path.join(out_dir, "plots")
    os.makedirs(plot_dir, exist_ok=True)
    model = PipelineModel.load(os.path.join(out_dir, "model"))
    sdf = spark.read.parquet(os.path.join(out_dir, split))
    scored = score_frame(model, sdf).select(
        F.col("label"), F.col("p_churn").alias("score")
    )
    curve = (
        _with_metrics(sweep_scores(scored))
        .select("t", "precision", "recall", "f1")
        .orderBy("t")
    )
    rows = [r.asDict() for r in curve.collect()]

    csv_path = os.path.join(plot_dir, "threshold_curve.csv")
    with open(csv_path, "w") as f:
        f.write("threshold,precision,recall,f1\n")
        for r in rows:
            f.write(f"{r['t']},{r['precision']},{r['recall']},{r['f1']}\n")

    best = None
    metrics_path = os.path.join(out_dir, "metrics.json")
    if os.path.exists(metrics_path):
        with open(metrics_path) as f:
            best = json.load(f).get("best_threshold")

    curve_png = render_threshold_curve(
        rows, os.path.join(plot_dir, "threshold_curve.png"), best_threshold=best
    )
    coef_rows = [r.asDict() for r in coefficients_frame(spark, model).collect()]
    fi_png = render_feature_importance(
        coef_rows, os.path.join(plot_dir, "feature_importance.png")
    )
    return {"curve_csv": csv_path, "curve_png": curve_png, "importance_png": fi_png}


def run_eval(spark: SparkSession, out_dir: str) -> dict[str, float]:
    """Held-out evaluation: AUCs + confusion matrix at the persisted best
    threshold, confusion cells in ONE conditional aggregation."""
    test = spark.read.parquet(os.path.join(out_dir, "test")).cache()
    model = PipelineModel.load(os.path.join(out_dir, "model"))
    with open(os.path.join(out_dir, "metrics.json")) as f:
        threshold = json.load(f)["best_threshold"]

    metrics = evaluate_model(model, test)
    scored = score_frame(model, test, threshold=threshold)
    pos = F.col("label") == 1
    hit = F.col("prediction") == 1.0
    cm = scored.agg(
        F.sum(F.when(hit & pos, 1).otherwise(0)).alias("tp"),
        F.sum(F.when(hit & ~pos, 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~hit & pos, 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~hit & ~pos, 1).otherwise(0)).alias("tn"),
    ).collect()[0]
    metrics.update({k: int(cm[k]) for k in ("tp", "fp", "fn", "tn")})
    metrics["threshold"] = threshold
    return metrics
