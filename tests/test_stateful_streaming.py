"""Custom stateful streaming operator (applyInPandasWithState)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_retention_pipeline_spark.streaming.stateful import running_user_totals
from pyspark_retention_pipeline_spark.streaming.windows import _event_stream


def test_running_user_totals_match_batch(spark, sf_dir):
    from pyspark_retention_pipeline_spark.tables import load_events

    stream = running_user_totals(_event_stream(spark, sf_dir))
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("t_user_totals")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # In update mode the memory sink appends each emitted update; the final
    # state per user is the max total (counts only grow).
    out = (
        spark.sql("SELECT * FROM t_user_totals")
        .groupBy("user_id")
        .agg(F.max("total_events").alias("total_events"))
    )
    batch = load_events(spark, sf_dir).groupBy("user_id").agg(
        F.count("*").alias("expected")
    )
    joined = out.join(batch, "user_id")
    mismatches = joined.filter(F.col("total_events") != F.col("expected")).count()
    assert mismatches == 0
    assert out.count() == batch.count()
