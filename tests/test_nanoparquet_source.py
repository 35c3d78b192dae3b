"""Python Data Source demo for nanosecond parquet — reads its own written
ns fixture (the shipped testdata is µs-precision now, which Spark reads
natively; see sources/nanoparquet.py docstring) and parallelizes by row
group."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from pyspark_retention_pipeline_spark.sources.nanoparquet import NanoParquetDataSource

N_ROWS = 600
BASE_NS = 1_700_000_000_000_000_000


def _write_nano_fixture(path: str) -> None:
    ids = list(range(N_ROWS))
    table = pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array(
                [BASE_NS + i * 1_234_567_891 for i in ids], pa.timestamp("ns")
            ),
            "user_id": pa.array([i % 7 for i in ids], pa.int64()),
            "event_type": pa.array(
                [("click", "purchase", "signup")[i % 3] for i in ids]
            ),
            "value": pa.array([float(i) for i in ids], pa.float64()),
            "props": pa.array(["{}"] * N_ROWS),
        }
    )
    # Several row groups so the source's per-row-group planning is exercised.
    pq.write_table(table, path, row_group_size=100)


def test_nanoparquet_source_reads_nanos_exactly(spark, tmp_path):
    path = str(tmp_path / "nanos.parquet")
    _write_nano_fixture(path)
    spark.dataSource.register(NanoParquetDataSource)
    ds = spark.read.format("nanoparquet").option("path", path).load()

    assert ds.count() == N_ROWS
    # Exact agreement with the generator on nanos and the derived micros.
    bad = ds.filter(
        (F.col("ts_ns") != F.lit(BASE_NS) + F.col("event_id") * 1_234_567_891)
        | (F.col("ts_us") != F.expr("ts_ns DIV 1000"))
    )
    assert bad.count() == 0


def test_nanoparquet_source_is_partitioned(spark, tmp_path):
    path = str(tmp_path / "nanos.parquet")
    _write_nano_fixture(path)
    spark.dataSource.register(NanoParquetDataSource)
    ds = spark.read.format("nanoparquet").option("path", path).load()
    # One partition per row group; aggregation over it works.
    assert ds.rdd.getNumPartitions() >= 6
    assert ds.groupBy("event_type").count().count() == 3
