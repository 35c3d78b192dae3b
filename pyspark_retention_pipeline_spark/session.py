"""SparkSession factory tuned for local testing while staying cluster-safe.

The reference builds its session with a bare ``SparkSession.builder.getOrCreate()``
(reference ``pipeline/etl.py:9-10``); we centralize session construction and pin
the settings that matter for correctness (UTC session time zone — timestamp
hash parity with external oracles) and for scale (AQE, sane shuffle
partitioning). On a real cluster every config here is still valid; only
``master``/memory come from the submit environment instead.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pyspark_retention_pipeline_spark",
    shuffle_partitions: int | None = None,
    master: str | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with engine defaults.

    Notes on the defaults:
      * ``spark.sql.adaptive.enabled`` — AQE re-plans at runtime (skew joins,
        partition coalescing); mandatory posture for 100 TB inputs.
      * ``spark.sql.session.timeZone=UTC`` — deterministic timestamp semantics.
      * shuffle partitions default to the local core count rather than 200 —
        on a cluster, size this ~2-3× total executor cores.

    No ``nanosAsLong`` here: events-timestamp precision is probed per file by
    :func:`pyspark_retention_pipeline_spark.tables.load_events`, which sets
    the legacy flag only when it actually finds nanosecond parquet.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = os.cpu_count() or 8

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
