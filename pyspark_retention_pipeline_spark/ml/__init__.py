"""MLlib tier — churn pipeline builder, training, evaluation, scoring."""

from .pipeline import (
    FEATURE_COLS,
    add_class_weight,
    build_churn_pipeline,
    coefficients_frame,
    evaluate_model,
    score_frame,
    score_records,
    train_churn_model,
)

__all__ = [
    "FEATURE_COLS",
    "add_class_weight",
    "build_churn_pipeline",
    "coefficients_frame",
    "evaluate_model",
    "score_frame",
    "score_records",
    "train_churn_model",
]
