"""Similarity-search agreement and recall properties."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from pyspark_retention_pipeline_spark.registry import all_queries

QUERIES = all_queries()


def test_vectorized_knn_matches_fold_knn(spark, sf_dir):
    """The BLAS path and the expression-fold path must agree on pairs and on
    cosine values to float tolerance."""
    fold = QUERIES["knn_bruteforce"](spark, sf_dir)
    vec = QUERIES["knn_vectorized"](spark, sf_dir)
    f_pairs = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in fold.collect()}
    v_pairs = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in vec.collect()}
    assert set(f_pairs) == set(v_pairs)
    for k in f_pairs:
        assert f_pairs[k] == pytest.approx(v_pairs[k], abs=1e-6)


def test_lsh_recall_on_near_duplicates(spark, sf_dir):
    """Hyperplane-LSH buckets must capture genuinely near-identical vector
    pairs (cosine >= 0.99) — the property the ANN path is for. (Random
    uncorrelated embeddings rarely collide in 12-bit buckets; exact-dup
    level similarity must.)"""
    near = (
        QUERIES["embedding_neardup"](spark, sf_dir)
        .filter(F.col("cosine") >= 0.99)
        .collect()
    )
    if not near:
        pytest.skip("testdata has no >=0.99 cosine pairs under vec_id<100")
    lsh_pairs = {
        (r["v1"], r["v2"]) for r in QUERIES["lsh_bucket_candidates"](spark, sf_dir).collect()
    }
    captured = sum(1 for r in near if (r["v1"], r["v2"]) in lsh_pairs)
    assert captured / len(near) >= 0.8


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SLOW_TESTS"),
    reason="CV training is slow; set SPARK_GRAFT_SLOW_TESTS=1",
)
def test_cross_validated_training(spark, sf_dir):
    from pyspark_retention_pipeline_spark.ml import train_churn_model
    from pyspark_retention_pipeline_spark.operators.retention import churn_feature_frame

    model = train_churn_model(churn_feature_frame(spark, sf_dir), cross_validate=True)
    lr = model.stages[-1]
    assert lr.getRegParam() in (0.0, 0.01, 0.1)
    assert lr.getElasticNetParam() in (0.0, 0.5, 1.0)


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF with 4-of-16 probed cells must recover most of the exact top-5
    (recall@5 >= 0.5 on random-ish data; clustered data does far better —
    the point is the candidate set shrank ~4x)."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["knn_bruteforce"](spark, sf_dir).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["ivf_knn"](spark, sf_dir).collect()
    }
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.5, f"IVF recall@{len(exact)} = {recall}"
