"""Structured Streaming twins agree with the batch event-time operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_retention_pipeline_spark.operators.events import tumbling_hourly
from pyspark_retention_pipeline_spark.streaming import session_stream, tumbling_stream
from pyspark_retention_pipeline_spark.streaming.windows import run_to_completion


def test_tumbling_stream_matches_batch(spark, sf_dir):
    stream_out = run_to_completion(tumbling_stream(spark, sf_dir), "t_tumbling")
    batch_out = tumbling_hourly(spark, sf_dir)
    s_total = stream_out.agg(F.sum("n_events")).collect()[0][0]
    b_total = batch_out.agg(F.sum("n_events")).collect()[0][0]
    assert s_total == b_total
    # Same number of (window, type) groups as (hour_bucket, type) groups.
    assert stream_out.count() == batch_out.count()


def test_session_stream_runs(spark, sf_dir):
    out = run_to_completion(session_stream(spark, sf_dir), "t_sessions")
    assert out.count() > 0
    assert out.agg(F.min("n_events")).collect()[0][0] >= 1
