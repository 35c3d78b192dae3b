"""Python Data Source for nanosecond parquet — agrees with the legacy-flag
reader and parallelizes by row group."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_retention_pipeline_spark.sources.nanoparquet import NanoParquetDataSource
from pyspark_retention_pipeline_spark.tables import load_events


def test_nanoparquet_source_matches_legacy_reader(spark, sf_dir):
    spark.dataSource.register(NanoParquetDataSource)
    ds = (
        spark.read.format("nanoparquet")
        .option("path", f"{sf_dir}/events.parquet")
        .load()
    )
    legacy = load_events(spark, sf_dir)

    assert ds.count() == legacy.count()
    # Exact agreement on the nanos and the derived micros.
    a = ds.select("event_id", F.col("ts_ns").alias("ts_a"), F.col("ts_us").alias("us_a"))
    b = legacy.select("event_id", F.col("ts").alias("ts_b"), F.col("ts_us").alias("us_b"))
    joined = a.join(b, "event_id")
    assert joined.filter(
        (F.col("ts_a") != F.col("ts_b")) | (F.col("us_a") != F.col("us_b"))
    ).count() == 0


def test_nanoparquet_source_is_partitioned(spark, sf_dir):
    spark.dataSource.register(NanoParquetDataSource)
    ds = (
        spark.read.format("nanoparquet")
        .option("path", f"{sf_dir}/events.parquet")
        .load()
    )
    # At least one partition per row group; aggregation over it works.
    by_type = ds.groupBy("event_type").count()
    assert by_type.count() >= 3
