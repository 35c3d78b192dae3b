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


def test_stream_stream_attribution_join(spark, sf_dir):
    """Watermarked stream-stream join: every attributed purchase follows the
    same user's signup within the window; spot-check against a batch compute."""
    from pyspark_retention_pipeline_spark.streaming.joins import (
        signup_purchase_attribution,
    )
    from pyspark_retention_pipeline_spark.streaming.windows import run_to_completion
    from pyspark_retention_pipeline_spark.tables import load_events

    out_df = signup_purchase_attribution(spark, sf_dir)
    q = (
        out_df.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_attrib")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM t_attrib")
    n = got.count()
    bad = got.filter(
        (F.col("purchase_time") < F.col("signup_time"))
        | (F.col("purchase_time") > F.col("signup_time") + F.expr("INTERVAL 30 minutes"))
        | (F.col("s_user") != F.col("p_user"))
    ).count()
    assert bad == 0

    # Batch reference: same attribution predicate on the static table.
    e = load_events(spark, sf_dir)
    s = e.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("u"), F.col("ts_us").alias("s_us")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"), F.col("ts_us").alias("p_us")
    )
    expected = (
        s.join(p, "u")
        .filter((F.col("p_us") >= F.col("s_us")) & (F.col("p_us") - F.col("s_us") <= 1_800_000_000))
        .count()
    )
    assert n == expected


def test_foreachbatch_idempotent_sink(spark, sf_dir, tmp_path):
    """foreachBatch epoch-keyed sink: rows land once per epoch directory and
    total matches the batch aggregate."""
    import os

    from pyspark_retention_pipeline_spark.streaming.sinks import (
        write_stream_idempotent,
    )

    out = str(tmp_path / "sink")
    stream = tumbling_stream(spark, sf_dir)
    q = write_stream_idempotent(stream, out, "t_sink")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    epochs = [d for d in os.listdir(out) if d.startswith("epoch=")]
    assert epochs
    latest = max(epochs, key=lambda d: int(d.split("=")[1]))
    sunk = spark.read.parquet(os.path.join(out, latest))
    batch_total = tumbling_hourly(spark, sf_dir).agg(F.sum("n_events")).collect()[0][0]
    assert sunk.agg(F.sum("n_events")).collect()[0][0] == batch_total


def test_stream_dedup_drops_redeliveries(spark, sf_dir):
    from pyspark_retention_pipeline_spark.streaming.windows import dedup_stream
    from pyspark_retention_pipeline_spark.tables import load_events

    out = dedup_stream(spark, sf_dir)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_dedup")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT event_id FROM t_dedup")
    n_unique_src = load_events(spark, sf_dir).select("event_id").distinct().count()
    assert got.count() == n_unique_src
    assert got.distinct().count() == n_unique_src


def test_stream_static_join_flags_new_users(spark, sf_dir):
    """Stream-static enrichment agrees with the batch twin: same row count
    as the raw events, and is_new_user is exactly 'event on the user's first
    active day'."""
    from pyspark_retention_pipeline_spark.streaming.joins import (
        new_user_flagged_stream,
    )
    from pyspark_retention_pipeline_spark.tables import load_events

    out_df = new_user_flagged_stream(spark, sf_dir)
    q = (
        out_df.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_newuser")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM t_newuser")

    e = load_events(spark, sf_dir)
    assert got.count() == e.count()

    batch = (
        e.withColumn("event_day", F.expr("ts_us DIV 86400000000"))
        .withColumn(
            "first_day",
            F.min("event_day").over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "user_id"
                )
            ),
        )
        .withColumn("is_new_user", F.col("event_day") == F.col("first_day"))
    )
    b = {r.event_id: r.is_new_user for r in batch.select("event_id", "is_new_user").collect()}
    mismatches = [r for r in got.collect() if b[r.event_id] != r.is_new_user]
    assert not mismatches, mismatches[:5]
    # Sanity: some events are first-day and some are not.
    flags = {r.is_new_user for r in got.collect()}
    assert flags == {True, False}
